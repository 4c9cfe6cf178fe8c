from . import keyframe, optimizer, pcm, posegraph, vocab  # noqa: F401
