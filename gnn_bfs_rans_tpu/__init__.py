"""gnn_bfs_rans_tpu — TPU-native GNN flow-surrogate framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
Caesar3142/GNN-BFS-RANS: OpenFOAM mesh/field I/O, static padded graph
construction, message-passing conv zoo (GCN/GAT/GIN/Graph-Transformer),
field-wise weighted training, checkpoint/resume, inference + OpenFOAM
writeback, visualization, and multi-host data parallelism over a device mesh.
"""

__version__ = "0.1.0"
