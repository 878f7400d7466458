from .multiseq import MultiSeqRunner, make_seq_mesh
