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

from tpusparse.utils.checkpoint import (
    CheckpointManager,
    save_checkpoint,
    restore_checkpoint,
)
from tpusparse.utils.profiling import (
    trace,
    annotate,
    kernel_report,
    measured_roofline,
)

__all__ += [
    "CheckpointManager",
    "save_checkpoint",
    "restore_checkpoint",
    "trace",
    "annotate",
    "kernel_report",
    "measured_roofline",
]

from tpusparse.utils.debug import (
    validate_csr,
    check_csr,
    checked,
    compare_report,
)

__all__ += ["validate_csr", "check_csr", "checked", "compare_report"]

from tpusparse.utils.retry import with_retries, is_transient

__all__ += ["with_retries", "is_transient"]

from tpusparse.utils.matrices import (
    MATRIX_CATALOG,
    block_structured_csr,
    get_matrix,
    load_mtx,
    save_mtx,
)

__all__ += [
    "MATRIX_CATALOG",
    "block_structured_csr",
    "get_matrix",
    "load_mtx",
    "save_mtx",
]
