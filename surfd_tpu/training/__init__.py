from .common import (
    GracefulShutdown,
    StallWatchdog,
    TrainState,
    create_train_state,
    ema_update,
    global_norm,
    make_optimizer,
)
from .diffusion_trainer import DiffusionTrainConfig, DiffusionTrainer, make_train_step
from .ae_trainer import (
    AETrainConfig,
    init_ae,
    make_ae_apply_fns,
    curriculum_validate,
    make_ae_eval_step,
    make_ae_train_step,
)
