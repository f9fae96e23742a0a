from .dataset import (DATASET_REGISTRY, DataLoader, Registration2D3DDataset,
                      Registration2D3DForProjLossDataset, get_dataset,
                      normalize_intensity)  # noqa: F401
