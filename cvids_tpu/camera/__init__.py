from .pinhole import PinholeCamera, distort, undistort_iterative  # noqa: F401
from .models import (  # noqa: F401
    EquidistantCamera,
    MeiCamera,
    ScaramuzzaCamera,
    calibrate_pinhole,
)
from .chessboard import (  # noqa: F401
    calibrate_chessboards,
    chessboard_response,
    find_chessboard,
    render_chessboard,
)
