"""Model zoo: discriminative priors + DDPM denoisers.

All models consume/produce channels-last spectra:

* complex models: ``[B, T, F, 2] -> [B, T, F, 2]``
* magnitude models (GRN): ``[B, T, F] -> [B, T, F]``

Registered names mirror the reference's config strings
(``conf/*.yml`` ``model.name``) so experiment YAMLs port verbatim.
"""

from prior_diffuse_tpu.models import gcrn  # noqa: F401
from prior_diffuse_tpu.models import grn  # noqa: F401
from prior_diffuse_tpu.models import diffunet  # noqa: F401
from prior_diffuse_tpu.models import dbaiat  # noqa: F401
from prior_diffuse_tpu.models import diffwave  # noqa: F401

from prior_diffuse_tpu.models.gcrn import GCRN
from prior_diffuse_tpu.models.grn import GRN
from prior_diffuse_tpu.models.diffunet import DiffUNet, DiffUNet1, Nocon
from prior_diffuse_tpu.models.dbaiat import (
    AiaComplexTransRI,
    AiaComplexTransMag,
    DualAiaComplexTrans,
    DualAiaTransMergeCRM,
)
from prior_diffuse_tpu.models.diffwave import DiffWave

__all__ = [
    "GCRN",
    "GRN",
    "DiffUNet",
    "DiffUNet1",
    "Nocon",
    "AiaComplexTransRI",
    "AiaComplexTransMag",
    "DualAiaComplexTrans",
    "DualAiaTransMergeCRM",
    "DiffWave",
]
