"""wav2vecsegmenter_tpu — TPU-native speech segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
ahclab/Wav2VecSegmenter (wav2vec 2.0 segmentation-frame-classifier training,
sliding-window inference, pDAC/pSTRM/pTHR segmentation algorithms, and the
downstream speech-translation evaluation harness), designed for TPU device
meshes rather than ported from the PyTorch reference.
"""

__version__ = "0.1.0"
