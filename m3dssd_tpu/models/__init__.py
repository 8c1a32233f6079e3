from .rpn import M3DRPN, build, flatten_anchor_map, unflatten_anchor_map
from .dla import DLA, make_dla, DLA_VARIANTS
from .necks import DLASeg, DLAUp, IDAUp, DCN, DeformConv
from .attention import ANAB, NLPM
from .align import ShapeAlign, CenterAlign
