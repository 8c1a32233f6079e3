from .kitti import (AttrDict, read_kitti_cal, read_kitti_label, build_imdb,
                    Kitti3DDataset)
from .augment import Augmentation, Preprocess
from .loader import TrainLoader, balance_samples
