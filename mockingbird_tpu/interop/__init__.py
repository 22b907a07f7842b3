from .torch_weights import (  # noqa: F401
    convert_conformer_encoder, convert_encoder, convert_fregan_generator,
    convert_hifigan_generator, convert_ppg2mel,
    convert_tacotron, convert_vits,
    convert_wavernn, state_dict_to_numpy,
)
from .reference_loader import (  # noqa: F401
    load_reference_conformer, load_reference_encoder, load_reference_fregan,
    load_reference_hifigan_generator, load_reference_ppg2mel,
    load_reference_tacotron, load_reference_vits,
    load_reference_wavernn, reference_available,
)
