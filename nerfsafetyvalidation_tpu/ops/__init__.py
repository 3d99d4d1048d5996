"""TPU-native compute kernels replacing the reference's five CUDA extensions.

Reference mapping (see /root/reference):
  hash_encoding.py  <-  gridencoder/   (multires hash grid, N1)
  sh_encoding.py    <-  shencoder/     (real spherical harmonics, N2)
  freq_encoding.py  <-  freqencoder/   (NeRF positional encoding, N3)
  ray_ops.py        <-  raymarching/   (aabb slab test, bg sphere, morton, packbits, N4)
  compositing.py    <-  raymarching/   (transmittance compositing, N4)
  activation.py     <-  activation.py  (trunc_exp)
  losses.py         <-  loss.py
"""

from .activation import trunc_exp
from .freq_encoding import freq_encode, freq_output_dim
from .sh_encoding import sh_encode, sh_output_dim
from .hash_encoding import HashGridSpec, hash_grid_init, hash_grid_encode
from .ray_ops import near_far_from_aabb, sph_from_ray, morton3d, morton3d_invert, packbits
from .compositing import composite_rays, composite_weights
from .sample_pdf import sample_pdf
from .losses import mape_loss, huber_loss, eff_distloss
from .marching import march_rays, composite_marched, compact_samples
