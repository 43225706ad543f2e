from joeys2t_tpu.models.model import Seq2SeqModel, build_model  # noqa: F401
