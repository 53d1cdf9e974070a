"""covomix_tpu — a TPU-native (JAX/XLA/Pallas/pjit) multi-talker dialogue TTS framework.

Re-implements the full capability surface of CoVoMix (NeurIPS 2024, arXiv 2404.06690):

  text script --tokenizer--> Text2Semantic transformer (CoSingle / CoMix)
            --> HuBERT semantic tokens (50 Hz, 500 k-means units)
            --> flow-matching acoustic model (VoSingle / VoMix) --> 80-d mel (8 kHz, 20 ms)
            --> HiFi-GAN vocoder --> waveform

Design is TPU-first: pure-functional models over param pytrees, samplers as single
jitted `lax.scan`/`while_loop` programs, bf16 compute on the MXU, sharding via
`jax.sharding.Mesh` + NamedSharding (see covomix_tpu.parallel).

Reference behavioral contracts are cited as `<file>:<line>` into the upstream
PyTorch repo throughout the code base.
"""

__version__ = "0.1.0"
