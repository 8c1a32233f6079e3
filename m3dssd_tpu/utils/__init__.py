from .logging_utils import init_logging, StatTracker
from .checkpoint import save_checkpoint, restore_checkpoint, latest_step
