from .loaders import Dataset, load_dataset, load_npy_shards  # noqa: F401
