from rednose_tpu.msckf.triangulation import compute_pos, compute_pos_batch  # noqa: F401
