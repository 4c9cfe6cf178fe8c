from . import imu, window_ba  # noqa: F401
