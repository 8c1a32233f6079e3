from .detect import make_detector
from .hill_climb import hill_climb
from .test_driver import test_kitti_3d
