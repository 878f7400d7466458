from .flowlib import (
    flow_error,
    flow_kitti_error,
    flow_to_image,
    read_flow,
    read_kitti_png_flow,
    resize_flow,
    write_flow,
    write_kitti_png_flow,
)
