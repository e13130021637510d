"""Experimental namespace alias: the fused RIME lives at
africanus_tpu.rime.fused (mirrors the reference's
africanus.experimental.rime.fused layout)."""
