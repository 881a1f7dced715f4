from .checkpoint import (
    convert_torch_state_dict,
    export_torch_state_dict,
    load_msgpack,
    load_torch_checkpoint,
    save_msgpack,
    save_torch_pt,
)
from .config import Config, add_config_args, config_from_args

__all__ = [
    "Config",
    "add_config_args",
    "config_from_args",
    "convert_torch_state_dict",
    "export_torch_state_dict",
    "load_msgpack",
    "load_torch_checkpoint",
    "save_msgpack",
    "save_torch_pt",
]
