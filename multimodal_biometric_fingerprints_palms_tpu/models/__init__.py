from .backbone import FingerprintBackbone, EFFNETV2_S, EFFNETV2_TINY
from .projection_head import ProjectionHead
from .ssl_model import SSLModel
from .losses import nt_xent_loss, focal_tversky_loss, dice_loss, dice_coeff, iou_score
from .unetpp import NestedUNet
