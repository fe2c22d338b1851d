import sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from bench import load_corpus, CHUNK
from aircompressor_tpu.ops.batch import _pack
from aircompressor_tpu.ops import snappy_encode_pallas as enc
import snappy_host_check  # not needed
