from .config import (
    AEConfig,
    DiffusionConfig,
    GenerateConfig,
    ModelConfig,
    SurfDConfig,
    TrainConfig,
    apply_overrides,
    load_config,
    save_config,
)
from .logging import Logger
from .seed import fixseed
from .profiling import PhaseTimer, annotate, device_trace
