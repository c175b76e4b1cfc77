from rednose_tpu.models.kalman_filter import KalmanFilter  # noqa: F401
