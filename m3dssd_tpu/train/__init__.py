from .lr import make_lr_schedule
from .state import TrainState, create_train_state, make_train_step
