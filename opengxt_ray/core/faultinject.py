"""Fault injection for actor-pool stages (test/chaos utility).

``KillOnceActor`` wraps any callable-class stage and hard-kills its
worker process (``os._exit`` — a real worker death, not a catchable
exception) the FIRST time any instance finds the flag file absent;
every later construction/batch delegates to the wrapped stage. Used to
prove that a ``map_batches`` actor pool survives worker loss: Ray
restarts the actor, ``__init__`` re-runs, and the stage's broadcast
state must still resolve (see ``core/broadcast.py`` / ray#53727).

Lives in the package (not in ``tests/``) on purpose: Ray workers can
only unpickle classes whose module is importable on their side, and
the test directory is not on worker ``sys.path``.
"""

from __future__ import annotations

import os


class KillOnceActor:
    """Wrap ``inner_cls(**inner_kwargs)``; kill the worker once.

    The flag file is created just before the kill so exactly one worker
    dies per flag path, no matter how many actors race on it.
    """

    def __init__(self, inner_cls, inner_kwargs, flag_path):
        self.inner = inner_cls(**(inner_kwargs or {}))
        self.flag = flag_path

    def __call__(self, batch):
        if not os.path.exists(self.flag):
            with open(self.flag, "w") as f:
                f.write(str(os.getpid()))
            os._exit(1)
        return self.inner(batch)
