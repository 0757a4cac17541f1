from pstl_tpu.utils.meters import MeterDict, Timer  # noqa: F401
from pstl_tpu.utils.exp import setup_exp_dir, TeeLogger  # noqa: F401
