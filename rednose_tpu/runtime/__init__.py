from rednose_tpu.runtime.driver import Estimate, FilterEngine, KalmanError  # noqa: F401
