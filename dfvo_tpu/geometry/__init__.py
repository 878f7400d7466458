from .camera import SE3, Intrinsics, PinholeCamera
