"""Storage backend ABC (reference: helpers/data_backend/base.py:8 ``BaseDataBackend`` —
read/write/delete/exists/list_files/read_image_batch/torch_load/torch_save +
process-serializable instance representation, optional gzip compression of cache
tensors at base.py:126-153)."""

from __future__ import annotations

import gzip
import io
from abc import ABC, abstractmethod
from typing import Any, Dict, Iterable, List, Optional, Sequence, Tuple


class BaseDataBackend(ABC):
    id: str
    type: str = "base"
    compress_cache: bool = False

    @abstractmethod
    def read(self, location: str) -> bytes: ...

    @abstractmethod
    def write(self, location: str, data: bytes) -> None: ...

    @abstractmethod
    def delete(self, location: str) -> None: ...

    @abstractmethod
    def exists(self, location: str) -> bool: ...

    @abstractmethod
    def list_files(self, file_extensions: Optional[Sequence[str]] = None, instance_data_dir: Optional[str] = None) -> List[str]: ...

    # ---- images ------------------------------------------------------------------------
    def read_image(self, location: str):
        from PIL import Image

        image = Image.open(io.BytesIO(self.read(location)))
        return image

    def read_image_batch(self, locations: Sequence[str], delete_problematic_images: bool = False) -> Tuple[List[str], List[Any]]:
        kept, images = [], []
        for location in locations:
            try:
                images.append(self.read_image(location))
                kept.append(location)
            except Exception:
                if delete_problematic_images:
                    try:
                        self.delete(location)
                    except Exception:
                        pass
        return kept, images

    # ---- tensor (cache) IO -------------------------------------------------------------
    def _maybe_compress(self, payload: bytes) -> bytes:
        if self.compress_cache:
            return gzip.compress(payload)
        return payload

    def _maybe_decompress(self, payload: bytes) -> bytes:
        if payload[:2] == b"\x1f\x8b":  # gzip magic
            return gzip.decompress(payload)
        return payload

    def torch_save(self, obj: Any, location: str) -> None:
        """Serialize tensors/arrays in the reference's .pt cache format so existing
        caches interoperate. numpy arrays are converted to torch tensors."""
        import numpy as np
        import torch

        def to_torch(value):
            if isinstance(value, torch.Tensor):
                return value  # already torch (incl. bf16, which numpy can't hold)
            if isinstance(value, np.ndarray):
                return torch.from_numpy(np.ascontiguousarray(value))
            if isinstance(value, dict):
                return {k: to_torch(v) for k, v in value.items()}
            if isinstance(value, (list, tuple)):
                return type(value)(to_torch(v) for v in value)
            if hasattr(value, "dtype") and hasattr(value, "__array__"):  # jax array
                import jax.numpy as jnp

                if value.dtype == jnp.bfloat16:  # numpy round-trip would fail
                    return torch.from_numpy(np.asarray(value, dtype=np.float32)).to(torch.bfloat16)
                return torch.from_numpy(np.asarray(value))
            return value

        buffer = io.BytesIO()
        torch.save(to_torch(obj), buffer)
        self.write(location, self._maybe_compress(buffer.getvalue()))

    def torch_load(self, location: str) -> Any:
        import numpy as np
        import torch

        payload = self._maybe_decompress(self.read(location))
        obj = torch.load(io.BytesIO(payload), map_location="cpu", weights_only=False)

        def to_numpy(value):
            if isinstance(value, torch.Tensor):
                t = value.detach().cpu()
                if t.dtype == torch.bfloat16:
                    t = t.to(torch.float32)
                return t.numpy()
            if isinstance(value, dict):
                return {k: to_numpy(v) for k, v in value.items()}
            if isinstance(value, (list, tuple)):
                return type(value)(to_numpy(v) for v in value)
            return value

        return to_numpy(obj)

    def write_batch(self, locations: Sequence[str], payloads: Sequence[bytes]) -> None:
        for location, payload in zip(locations, payloads):
            self.write(location, payload)

    # ---- process serialization ----------------------------------------------------------
    def get_instance_representation(self) -> Dict[str, Any]:
        return {"type": self.type, "id": self.id}
