from .documents import read_documents
from .synth import interleave_documents, synth_corpus, ADMIN_POLYGONS

__all__ = ["read_documents", "interleave_documents", "synth_corpus",
           "ADMIN_POLYGONS"]
