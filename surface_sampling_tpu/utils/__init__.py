"""Cross-cutting utilities: logging, run folders, schedules, plotting."""

from surface_sampling_tpu.utils.logging import SilenceLogger, setup_logger
from surface_sampling_tpu.utils.sampling import create_anneal_schedule
from surface_sampling_tpu.utils.setup import setup_folders

__all__ = ["SilenceLogger", "create_anneal_schedule", "setup_folders", "setup_logger"]
