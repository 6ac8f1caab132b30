from ltx_core.components.diffusion_steps import EulerDiffusionStep
from ltx_core.components.guiders import (
    CFGGuider,
    CFGStarRescalingGuider,
    LegacyStatefulAPGGuider,
    LtxAPGGuider,
    STGGuider,
    projection_coef,
)
from ltx_core.components.noisers import GaussianNoiser
from ltx_core.components.patchifiers import (
    AudioPatchifier,
    VideoLatentPatchifier,
    get_pixel_coords,
)
from ltx_core.components.protocols import (
    DiffusionStepProtocol,
    GuiderProtocol,
    Noiser,
    Patchifier,
    SchedulerProtocol,
)
from ltx_core.components.schedulers import (
    BetaScheduler,
    LinearQuadraticScheduler,
    LTX2Scheduler,
)

__all__ = [
    "EulerDiffusionStep", "CFGGuider", "CFGStarRescalingGuider",
    "LegacyStatefulAPGGuider", "LtxAPGGuider", "STGGuider", "projection_coef",
    "GaussianNoiser", "AudioPatchifier", "VideoLatentPatchifier",
    "get_pixel_coords", "DiffusionStepProtocol", "GuiderProtocol", "Noiser",
    "Patchifier", "SchedulerProtocol", "BetaScheduler",
    "LinearQuadraticScheduler", "LTX2Scheduler",
]
