from .unsup import unsup_loss_multi_stage, inverse_warping
from .aug import aug_loss_multi_stage, random_image_mask
from .rays import sl1_loss, img2mse, mse2psnr, acc_threshold, abs_error
from .supervised import cas_mvsnet_loss, thres_metric, abs_depth_error_metric
