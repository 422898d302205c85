"""Checkpoint / resume for MC runs."""

from surface_sampling_tpu.io.checkpoint import load_checkpoint, save_checkpoint

__all__ = ["load_checkpoint", "save_checkpoint"]
