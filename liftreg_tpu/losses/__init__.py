from .registration import (LOSS_REGISTRY, RegFactorSchedule, RegNet2D3DLoss,
                           Subspace2DLoss, SubspaceLoss, displacement_reg,
                           get_loss, sigmoid_decay)  # noqa: F401
from .similarity import (SIMILARITY_REGISTRY, get_similarity, gradient_loss,
                         lncc_loss, ncc_loss, ncc_sqr_loss,
                         ngf_loss)  # noqa: F401
