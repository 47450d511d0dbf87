"""Common infrastructure (reference: dart/common, SURVEY.md 2.1).

Python-idiomatic equivalents of the reference's C++ extension plumbing:
Signal/slots, NameManager, Subject/Observer, Uri + resource retrieval,
Timer, and a Composite/Aspect runtime-extension mechanism. In a functional
JAX engine most C++ infra patterns dissolve, but downstream code (GUI,
loaders, biomechanics pipelines) uses these directly.
"""

from nimblephysics_tpu.common.infra import (
    Aspect,
    Composite,
    NameManager,
    Signal,
    Subject,
    Timer,
    Uri,
)
from nimblephysics_tpu.common.resources import (
    CompositeResourceRetriever,
    LocalResourceRetriever,
    PackageResourceRetriever,
)
