from healnet_tpu.utils.boxdict import Box
from healnet_tpu.utils.config import Config, flatten_config, unflatten_config
from healnet_tpu.utils.io import pickle_obj, unpickle
from healnet_tpu.utils.train_utils import (
    EarlyStopping,
    calc_reg_loss,
    count_parameters,
    l1_norm,
)
from healnet_tpu.utils.tracking import Tracker, wandb_available
from healnet_tpu.utils.profiling import StepTimer, enable_compilation_cache, trace

__all__ = [
    "Box",
    "Config",
    "flatten_config",
    "unflatten_config",
    "pickle_obj",
    "unpickle",
    "EarlyStopping",
    "calc_reg_loss",
    "count_parameters",
    "l1_norm",
    "Tracker",
    "wandb_available",
    "StepTimer",
    "enable_compilation_cache",
    "trace",
]
