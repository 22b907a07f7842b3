from .hifigan import (  # noqa: F401
    Generator, HifiganDiscriminators, MultiPeriodDiscriminator,
    MultiScaleDiscriminator, hifigan_config, init_generator,
)
from .fregan import (  # noqa: F401
    FreGanGenerator, FreGanDiscriminators, fregan_config, dwt_haar,
)
from .wavernn import (  # noqa: F401
    WaveRNN, WaveRnnVocoder, wavernn_config, fold_with_overlap, xfade_and_unfold,
)
from .inference import GanVocoder, load_vocoder  # noqa: F401
from .gan_losses import (  # noqa: F401
    discriminator_loss, feature_loss, generator_loss, kl_loss,
)
from . import gan_train, wavernn_train  # noqa: F401
