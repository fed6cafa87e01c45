from .binary import decode_image, extract_features, frame_sample

__all__ = ["decode_image", "extract_features", "frame_sample"]
