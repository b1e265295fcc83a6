from lins_tpu.frontend.types import (
    RangeImage, SegmentedScan, FeatureCloud, ScanFeatures)
from lins_tpu.frontend.pipeline import process_cloud, make_frontend
