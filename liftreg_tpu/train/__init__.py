from .optim import PlateauLR, StepLR, build_optimizer  # noqa: F401
from .trainer import MetricsLogger, RegistrationTrainer, load_pca  # noqa: F401
