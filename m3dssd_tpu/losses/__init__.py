from .rpn_loss import RPNLossConfig, rpn_3d_loss
