from tpusparse.utils.config import (
    Config,
    get_config,
    set_config,
    interpret_mode,
    cdiv,
    round_up,
)

__all__ = [
    "Config",
    "get_config",
    "set_config",
    "interpret_mode",
    "cdiv",
    "round_up",
]
