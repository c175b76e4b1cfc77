"""rednose_tpu: TPU-native Kalman-filter framework (EKF / ESKF / MSCKF).

See README.md for the architecture and the mapping to the reference
(commaai/rednose) component inventory.
"""

from rednose_tpu.core.spec import FilterSpec, ObservationModel  # noqa: F401
from rednose_tpu.registry import lookup, register, registered_filters  # noqa: F401
from rednose_tpu.runtime.driver import FilterEngine, KalmanError  # noqa: F401

__version__ = "0.1.0"
