from .schedule import warmup_multistep_schedule
from .state import TrainState, create_train_state
from .step import make_train_step, make_val_step
