"""Compatibility: porting reference PyTorch checkpoints into this framework."""

from .torch_port import convert_state_dict, load_torch_checkpoint

__all__ = ["convert_state_dict", "load_torch_checkpoint"]
