"""Autograd-boundary layer: custom-VJP level ops + multilevel pyramids."""
from pytorch_wavelets_tpu.transforms.dwt import (  # noqa: F401
    dwt2d, idwt2d, dwt1d, idwt1d, swt2d, iswt2d,
)
from pytorch_wavelets_tpu.transforms.dtcwt_xfm import (  # noqa: F401
    dtcwt2d, idtcwt2d, dtcwt_fwd_filters, dtcwt_inv_filters,
)
from pytorch_wavelets_tpu.transforms.scatternet import (  # noqa: F401
    scat_layer_j1, scat_layer_j2, smooth_mag, avg_pool2,
)
from pytorch_wavelets_tpu.transforms.dtcwt_alt import (  # noqa: F401
    cplxdual2d, icplxdual2d, DTCWTForward2, DTCWTInverse2,
)
