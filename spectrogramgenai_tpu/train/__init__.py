from spectrogramgenai_tpu.train.state import TrainState
from spectrogramgenai_tpu.train.common import (
    make_adamw_onecycle,
    make_rmsprop,
    state_shardings,
    tp_param_sharding,
)

__all__ = [
    "TrainState",
    "make_adamw_onecycle",
    "make_rmsprop",
    "state_shardings",
    "tp_param_sharding",
]
