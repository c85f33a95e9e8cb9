from .optim import (build_optimizer, build_scheduler, set_learning_rate,
                    current_learning_rate, AVAILABLE_OPTIMS, AVAILABLE_SCHEDS)
from .state import TrainState, create_train_state, param_count
from .steps import make_train_step, make_eval_step
from .trainer import Trainer

__all__ = ['build_optimizer', 'build_scheduler', 'set_learning_rate',
           'current_learning_rate', 'AVAILABLE_OPTIMS', 'AVAILABLE_SCHEDS',
           'TrainState', 'create_train_state', 'param_count',
           'make_train_step', 'make_eval_step', 'Trainer']
