from . import geometry, sampling, composite, image, knn, interpolate  # noqa: F401
