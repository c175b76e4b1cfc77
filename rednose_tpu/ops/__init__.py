from rednose_tpu.ops import quaternion  # noqa: F401
