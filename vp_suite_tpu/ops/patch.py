r"""Space-to-depth patchify ops (PredRNN-style).

NHWC equivalents of the reference's ``_reshape_patch`` / ``_reshape_patch_back``
(``vp_suite/models/predrnn_v2.py:232-250``). Channel ordering of the packed
patches is (p_h, p_w, c), matching the reference so converted weights line up.
"""
def patchify(x, patch_size: int):
    r"""[b, t, h, w, c] -> [b, t, h/p, w/p, p*p*c] with packed-channel order
    (p_h, p_w, c)."""
    b, t, h, w, c = x.shape
    p = patch_size
    hp, wp = h // p, w // p
    x = x.reshape(b, t, hp, p, wp, p, c)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6)  # [b, t, hp, wp, p, p, c]
    return x.reshape(b, t, hp, wp, p * p * c)


def unpatchify(x, patch_size: int):
    r"""[b, t, hp, wp, p*p*c] -> [b, t, hp*p, wp*p, c]."""
    b, t, hp, wp, cpp = x.shape
    p = patch_size
    c = cpp // (p * p)
    x = x.reshape(b, t, hp, wp, p, p, c)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6)  # [b, t, hp, p, wp, p, c]
    return x.reshape(b, t, hp * p, wp * p, c)
