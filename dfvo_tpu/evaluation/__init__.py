from .kitti_odometry import KittiEvalOdom, umeyama_alignment
