"""Model zoo: the Dis-PU generator and the PointNet++-MSG discriminator."""

from dispu_tpu.models.generator import DisPUGenerator
from dispu_tpu.models.discriminator import PatchDiscriminator

__all__ = ["DisPUGenerator", "PatchDiscriminator"]
