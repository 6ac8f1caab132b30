from ltx_pipelines.bridge import MLXPipelineConfig, TPUPipelineConfig, run_generate
from ltx_pipelines.distilled import DistilledPipeline
from ltx_pipelines.ic_lora import ICLoraPipeline
from ltx_pipelines.keyframe_interpolation import KeyframeInterpolationPipeline
from ltx_pipelines.ti2vid_one_stage import TI2VidOneStage, TI2VidOneStagePipeline
from ltx_pipelines.ti2vid_two_stages import TI2VidTwoStages, TI2VidTwoStagesPipeline
from ltx_pipelines.utils.model_ledger import ModelLedger

__all__ = [
    "DistilledPipeline",
    "ICLoraPipeline",
    "KeyframeInterpolationPipeline",
    "TI2VidOneStage",
    "TI2VidOneStagePipeline",
    "TI2VidTwoStages",
    "TI2VidTwoStagesPipeline",
    "ModelLedger",
    "MLXPipelineConfig",
    "TPUPipelineConfig",
    "run_generate",
]
