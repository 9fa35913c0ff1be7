"""TPU-native facial-analysis framework (JAX/XLA/Pallas).

Capability-complete rebuild of av-savchenko/HSE_FaceRec_tf, designed TPU-first:
see README.md for the architecture and PARITY.md for the component mapping.

Quick start::

    from hse_facerec_tf_tpu import FacialAnalyzer, zoo
    analyzer = FacialAnalyzer.from_reference_models(zoo.MTCNN_PB, zoo.AGEGENDER_PB)
    faces = analyzer.analyze(rgb_image)           # detect + age/gender/identity
"""

__version__ = "0.1.0"

from .config import AlbumConfig, AnalyzerConfig, DetectorConfig, TrainConfig


def __getattr__(name):
    # lazy imports keep `import hse_facerec_tf_tpu` light (no jax warm-up)
    if name == "FacialAnalyzer":
        from .pipelines.analyzer import FacialAnalyzer

        return FacialAnalyzer
    if name == "MTCNNDetector":
        from .pipelines.detector import MTCNNDetector

        return MTCNNDetector
    if name == "AlbumOrganizer":
        from .pipelines.album import AlbumOrganizer

        return AlbumOrganizer
    if name == "EmbeddingExtractor":
        from .pipelines.embedder import EmbeddingExtractor

        return EmbeddingExtractor
    if name == "KNNIdentifier":
        from .pipelines.identification import KNNIdentifier

        return KNNIdentifier
    if name == "zoo":
        from .models import zoo

        return zoo
    raise AttributeError(name)
