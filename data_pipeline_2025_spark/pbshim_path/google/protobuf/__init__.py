"""google.protobuf resolved by PATH EXTENSION from a BSD-licensed
pure-Python runtime already installed on the host (e.g. the protobuf
6.32.0 bundled with google-cloud-sdk) — nothing is vendored into the
repo.

Spark 4's transformWithStateInPandas state protocol ships generated
code (pyspark/sql/streaming/proto/StateMessage_pb2.py) built by
protoc 6.33.0, whose import calls ValidateProtobufRuntimeVersion and
refuses any older runtime outright. StateMessage.proto is plain
proto3 (no editions features), so a 6.3x runtime parses and builds
it fine; the version gate is NARROWED here (not disabled — see
``_validate_scoped`` below), and the CORRECTNESS of the resulting
protocol is proven end-to-end by the q146 oracle check and
tests/test_stateful.py (running totals hash-matched against batch
SQL), not assumed.

Round-6 hardening (round-5 advisor, low):
- the runtime location is PROBED from ``SPARK_GRAFT_PROTOBUF_RUNTIME``
  (env var, explicit override) followed by a candidate list, instead
  of one hardcoded container path;
- the version-gate bypass is SCOPED: only the known-compatible skew
  (public-domain 6.x gencode at most two minors NEWER than this 6.x
  runtime, no pre-release suffix) is accepted; every other
  (gencode, runtime) pair still goes through the original validator,
  so unrelated protobuf consumers in the interpreter keep their
  compatibility gate.
"""

import os as _os

_ENV_VAR = "SPARK_GRAFT_PROTOBUF_RUNTIME"
# Candidate pure-Python runtimes, most specific first. Each entry is
# the directory that CONTAINS the ``google/protobuf`` package files.
_CANDIDATES = (
    _os.environ.get(_ENV_VAR, ""),
    "/usr/lib/google-cloud-sdk/platform/google_appengine/google/protobuf",
    "/usr/lib/google-cloud-sdk/lib/third_party/google/protobuf",
    "/usr/local/google-cloud-sdk/platform/google_appengine/google/protobuf",
    _os.path.expanduser(
        "~/google-cloud-sdk/platform/google_appengine/google/protobuf"
    ),
)

_RUNTIME = next(
    (p for p in _CANDIDATES if p and _os.path.isdir(p)),
    None,
)
if _RUNTIME is None:
    raise ImportError(
        "no bundled pure-Python protobuf runtime found; set "
        f"{_ENV_VAR} to a directory containing the google/protobuf "
        "package files"
    )
__path__.append(_RUNTIME)

from google.protobuf import runtime_version as _rv  # noqa: E402

__version__ = f"{_rv.MAJOR}.{_rv.MINOR}.{_rv.PATCH}"

_orig_validate = _rv.ValidateProtobufRuntimeVersion


def _validate_scoped(
    gen_domain, gen_major, gen_minor, gen_patch, gen_suffix, location
):
    """Accept ONLY the known-compatible skew this shim exists for:
    public-domain gencode from a protoc of the same major, at most
    two minors newer than the runtime, no pre-release suffix (Spark's
    StateMessage_pb2 is protoc 6.33 against the bundled 6.32
    runtime — plain proto3, no editions features). Anything else is
    delegated to the original validator unchanged, so the gate stays
    live for every other protobuf consumer in this interpreter."""
    if (
        gen_domain == _rv.Domain.PUBLIC
        and gen_major == _rv.MAJOR
        and _rv.MINOR <= gen_minor <= _rv.MINOR + 2
        and not gen_suffix
    ):
        return None
    return _orig_validate(
        gen_domain, gen_major, gen_minor, gen_patch, gen_suffix, location
    )


_rv.ValidateProtobufRuntimeVersion = _validate_scoped
