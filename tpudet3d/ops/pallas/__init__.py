from .preprocess import preprocess_images

__all__ = ['preprocess_images']
