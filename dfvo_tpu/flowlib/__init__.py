from .flowlib import (
    flow_to_image,
    read_flow,
    resize_flow,
    write_flow,
    write_kitti_png_flow,
)
