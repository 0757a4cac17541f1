from pstl_tpu.models.net import Net, normalize_xyth, pos_encoding  # noqa: F401
