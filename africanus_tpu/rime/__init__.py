from africanus_tpu.rime.phase import phase_delay, phase_delay_ri

__all__ = ["phase_delay", "phase_delay_ri"]
