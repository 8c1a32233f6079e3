from .kitti_eval import evaluate_kitti, get_official_eval_result
from .kitti_common import get_label_annos
from .rotate_iou import rotate_iou, d3_box_overlap
