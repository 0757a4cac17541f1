from pstl_tpu.ops import stl, dynamics, geometry, guidance_loss  # noqa: F401
