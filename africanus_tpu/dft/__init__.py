from africanus_tpu.dft.kernels import im_to_vis, vis_to_im, im_to_vis_ri, vis_to_im_ri

__all__ = ["im_to_vis", "vis_to_im", "im_to_vis_ri", "vis_to_im_ri"]
