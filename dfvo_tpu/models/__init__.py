from .resnet_encoder import ResnetEncoder
from .depth_decoder import DepthDecoder
from .pose_decoder import PoseDecoder
from .monodepth2 import Monodepth2Depth, Monodepth2Pose, disp_to_depth
from .liteflownet import LiteFlowNet
