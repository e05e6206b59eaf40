from prdisagg_tpu.data.sampler import DeviceDataset
from prdisagg_tpu.data.synthetic import make_synthetic_dataset

__all__ = ["DeviceDataset", "make_synthetic_dataset"]
