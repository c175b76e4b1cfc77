from rednose_tpu.parallel.sharding import (  # noqa: F401
    BANK_AXIS,
    bank_sharding,
    make_bank_mesh,
    shard_bank,
    sharded_bank_rmse,
    sharded_run_bank,
)
