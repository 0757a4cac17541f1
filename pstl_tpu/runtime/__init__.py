from pstl_tpu.runtime.shard_store import ShardStore, write_store  # noqa: F401
