from .rgbd import get_dataset, ReplicaDataset, ScanNetDataset, TUMDataset  # noqa: F401
