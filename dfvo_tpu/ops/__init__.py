from .warp import grid_sample, warp_image_by_flow, flow_to_coords, coords_grid
