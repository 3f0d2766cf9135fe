from .sampling import (
    grid_sample_2d,
    grid_sample_3d,
    loss_bilinear_sample,
    resize,
    resize_bilinear,
    resize_nearest,
    resize_trilinear,
)
from .warp import homo_warp, plane_sweep_variance
from .image import avg_pool_2d, ssim, depth_smoothness, gradient_x, gradient_y
