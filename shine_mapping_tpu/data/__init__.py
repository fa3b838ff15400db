from . import io, pose, preprocess, sampler, semantic_kitti, dataset

__all__ = ["io", "pose", "preprocess", "sampler", "semantic_kitti", "dataset"]
