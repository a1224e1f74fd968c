import jax, jax.numpy as jnp
import uvc_tpu.models.t2t_vit as T

def fake_unfold(x, k, s, p):
    b, h, w, c = x.shape
    oh = (h + 2*p - k)//s + 1
    ow = (w + 2*p - k)//s + 1
    base = x[:, :oh*s:s, :ow*s:s, :1]
    return jnp.broadcast_to(base, (b, oh, ow, c*k*k)).reshape(b, oh*ow, c*k*k)

T._unfold = fake_unfold
from bench import bench_model
on = jax.devices()[0].platform != 'cpu'
print('t2t with FAKE unfold:', bench_model('t2t_vit_14', 256, 10, on_tpu=on))
