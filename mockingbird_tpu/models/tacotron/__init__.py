from .model import (  # noqa: F401
    Tacotron, TacotronDecoderCell, TacotronEncoder, CBHG, LSA, PreNet,
    GlobalStyleToken, init_tacotron, tacotron_config,
)
from .inference import Synthesizer  # noqa: F401
from .dataset import SynthesizerDataset, collate_synthesizer, DataLoader  # noqa: F401
from .train import train, run_gta_synthesis, tacotron_loss, DEFAULT_SCHEDULE  # noqa: F401
from .preprocess import preprocess_dataset, create_embeddings  # noqa: F401
