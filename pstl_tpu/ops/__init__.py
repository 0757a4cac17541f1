from pstl_tpu.ops import stl, dynamics, geometry  # noqa: F401
