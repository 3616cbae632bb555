"""Store IO protocols — the commit-primitive boundary of the index store.

The store's crash-safety argument rests on exactly two primitives:

  * ``move_dir``  — publish a staged directory at its final path
  * ``put_text``  — publish a small control file (manifest, meta.json)

On POSIX/NFS/fuse filesystems both are atomic renames (``LocalIO``) and a
pre-existing destination implies a COMPLETE previous publish. On raw object
stores (S3/GCS/ABFS) there is no rename: ``ObjectStoreIO`` publishes a
directory by copying objects (idempotent re-PUT on retry) and publishes
control files with a single-object PUT — atomic at the object level, which
is all the manifest-last commit order needs. Because a copy is NOT atomic,
readers/resumers must gate on *lineage membership*, never on "destination
prefix exists": ``IndexStore`` consults ``StoreIO.atomic_rename`` to decide
whether an existing destination can be trusted (rename ⇒ yes) or must be
overwritten unless its partition has a committed lineage row (copy ⇒ no).

Deployments on real object stores can subclass ``StoreIO`` over an fsspec
filesystem; the sandbox has no cloud credentials, so ``ObjectStoreIO``
doubles as the simulation used by the two-pass-build and resume tests
(no-rename semantics over a local directory).

The reference needs none of this — its import state lives in a one-document
ES index (versionRepository.go:18-119) and ES owns segment durability; here
the store IS the durability layer, so the boundary is explicit.
"""

from __future__ import annotations

import shutil
import uuid
from pathlib import Path


class LocalIO:
    """Rename-capable filesystems: POSIX, NFS, fuse mounts."""

    atomic_rename = True

    def move_dir(self, src: Path, dest: Path) -> None:
        dest.parent.mkdir(parents=True, exist_ok=True)
        if dest.exists():
            # caller decided dest must be replaced: stage-in via rename so
            # readers never observe a half-replaced directory
            tmp = dest.parent / f".{dest.name}.{uuid.uuid4().hex}.replace"
            src.rename(tmp)
            shutil.rmtree(dest)
            tmp.rename(dest)
        else:
            src.rename(dest)

    def put_text(self, path: Path, text: str) -> None:
        path.parent.mkdir(parents=True, exist_ok=True)
        tmp = path.parent / f".{path.name}.{uuid.uuid4().hex}.tmp"
        tmp.write_text(text)
        tmp.rename(path)

    def append_text(self, path: Path, line: str) -> None:
        path.parent.mkdir(parents=True, exist_ok=True)
        with open(path, "a") as f:
            f.write(line)

    def remove_dir(self, path: Path) -> None:
        shutil.rmtree(path, ignore_errors=True)


class ObjectStoreIO:
    """No-rename stores (S3-style): publish by copy, overwrite on retry.

    ``move_dir`` copies file-by-file (each file = one PUT; re-running after
    a crash re-PUTs the same keys — idempotent) and only then deletes the
    staging prefix. ``put_text`` is a direct single-object PUT. Append-only
    logs don't exist on object stores; ``append_text`` emulates the
    read-modify-PUT a real deployment would replace with one marker object
    per partition. This class runs over a local directory and is used in
    tests to prove the build/resume protocol never relies on rename."""

    atomic_rename = False

    def move_dir(self, src: Path, dest: Path) -> None:
        if dest.exists():
            shutil.rmtree(dest)
        dest.parent.mkdir(parents=True, exist_ok=True)
        shutil.copytree(src, dest)
        shutil.rmtree(src)

    def put_text(self, path: Path, text: str) -> None:
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(text)

    def append_text(self, path: Path, line: str) -> None:
        path.parent.mkdir(parents=True, exist_ok=True)
        prior = path.read_text() if path.exists() else ""
        path.write_text(prior + line)

    def remove_dir(self, path: Path) -> None:
        shutil.rmtree(path, ignore_errors=True)


# Default protocol for plain-path roots. Tests (and exotic deployments)
# override via IndexStore(root, io=...) or by monkeypatching this.
DEFAULT_IO: LocalIO | ObjectStoreIO = LocalIO()


def resolve_io(root) -> LocalIO | ObjectStoreIO:
    return DEFAULT_IO
