from .config import (
    MISSING,
    Config,
    MissingMandatoryValue,
    compose,
    load_config,
    merge,
    resolve,
    save_config,
    to_plain,
    to_yaml,
)
from .registry import instantiate, register, resolve_target

__all__ = [
    "MISSING",
    "Config",
    "MissingMandatoryValue",
    "compose",
    "load_config",
    "merge",
    "resolve",
    "save_config",
    "to_plain",
    "to_yaml",
    "instantiate",
    "register",
    "resolve_target",
]
