from .pinhole import PinholeCamera, distort, undistort_iterative  # noqa: F401
