"""LLM-driven scene editor (reference ``viewer_with_llm.py``).

The reference few-shot-prompts Mistral-7B-Instruct to map natural
language to a JSON command schema (``viewer_with_llm.py:104-276``):

    {"command": "change_view" | "segment" | "reset_segmentation" |
                "change_color" | "reset_color" | "exit" | "unknown",
     ...args}

The contract here is the same schema with a pluggable NL backend:
``Assistant(llm=...)`` accepts any callable str -> str (a JAX LLM, an
API, or nothing). Without one, a grammar-based parser covers the same
command set so the editor is fully usable offline. Dispatch applies the
edits on the scene exactly as the reference does: ``segment`` zeroes
opacities outside the query mask (``:394-413``); ``change_color``
grayscales then tints the masked DC SH using the SH0 constant
(``:419-435``).
"""

from __future__ import annotations

import json
import re
from typing import Callable, Optional

import numpy as np
import jax.numpy as jnp

from tpugs.core.scene import GaussianScene

# reference COLOR_TO_RGB (viewer_with_llm.py)
COLOR_TO_RGB = {
    "red": (1.0, 0.0, 0.0),
    "green": (0.0, 1.0, 0.0),
    "blue": (0.0, 0.0, 1.0),
    "yellow": (1.0, 1.0, 0.0),
    "cyan": (0.0, 1.0, 1.0),
    "magenta": (1.0, 0.0, 1.0),
    "white": (1.0, 1.0, 1.0),
    "black": (0.0, 0.0, 0.0),
    "orange": (1.0, 0.5, 0.0),
    "purple": (0.5, 0.0, 0.5),
    "pink": (1.0, 0.75, 0.8),
    "gray": (0.5, 0.5, 0.5),
}

VIEWS = ("top", "front", "right", "left", "back", "bottom")

FEW_SHOT_PROMPT = """You convert user requests about a 3D scene into JSON.
Commands: change_view(view), segment(object), reset_segmentation,
change_color(object, color), reset_color, exit, unknown.
Examples:
user: show me the top view -> {"command": "change_view", "view": "top"}
user: segment out the table -> {"command": "segment", "object": "table"}
user: make the vase red -> {"command": "change_color", "object": "vase", "color": "red"}
user: undo the segmentation -> {"command": "reset_segmentation"}
user: quit -> {"command": "exit"}
Answer with JSON only.
user: {query} ->"""


def parse_rule_based(text: str) -> dict:
    """Grammar fallback covering the reference's command set."""
    t = text.lower().strip()
    if re.search(r"\b(exit|quit|bye|close)\b", t):
        return {"command": "exit"}
    if re.search(r"\b(reset|undo|restore).*(color|colour)", t):
        return {"command": "reset_color"}
    if re.search(r"\b(reset|undo|restore|clear)", t) and re.search(
        r"segment", t
    ):
        return {"command": "reset_segmentation"}
    if re.search(r"\b(reset|undo|restore|show all|original)\b", t):
        return {"command": "reset_segmentation"}
    m = re.search(r"\b(top|front|right|left|back|bottom)\b.*view", t) or re.search(
        r"view.*\b(top|front|right|left|back|bottom)\b", t
    ) or re.search(r"\b(top|front|right|left|back|bottom)\b", t)
    if m and re.search(r"view|look|show|camera", t):
        return {"command": "change_view", "view": m.group(1)}
    for color in COLOR_TO_RGB:
        if re.search(rf"\b{color}\b", t) and re.search(
            r"color|colour|paint|make|turn", t
        ):
            obj = _extract_object(t, exclude=color)
            return {"command": "change_color", "object": obj, "color": color}
    if re.search(r"segment|extract|select|isolate|show only|highlight", t):
        return {"command": "segment", "object": _extract_object(t)}
    return {"command": "unknown"}


def _extract_object(t: str, exclude: str = "") -> str:
    stop = {
        "the", "a", "an", "please", "out", "segment", "extract", "select",
        "isolate", "only", "show", "highlight", "make", "turn", "paint",
        "color", "colour", "of", "to", "in", "it", exclude,
    }
    words = [w for w in re.findall(r"[a-z]+", t) if w not in stop]
    return " ".join(words[-2:]) if words else "object"


class Assistant:
    """NL -> command dict (reference ``Assistant``, viewer_with_llm.py:95-316)."""

    def __init__(self, llm: Optional[Callable[[str], str]] = None):
        self.llm = llm

    def ask(self, query: str) -> dict:
        if self.llm is not None:
            raw = self.llm(FEW_SHOT_PROMPT.replace("{query}", query))
            try:
                start = raw.index("{")
                end = raw.rindex("}") + 1
                cmd = json.loads(raw[start:end])
                if isinstance(cmd, dict) and "command" in cmd:
                    return cmd
            except (ValueError, json.JSONDecodeError):
                pass
        return parse_rule_based(query)


class SceneEditor:
    """Applies assistant commands to a scene + features pair."""

    SH0 = 0.2820947917738781  # reference viewer_with_llm.py:419-435

    def __init__(
        self,
        scene: GaussianScene,
        features: jnp.ndarray,
        text_encoder: Optional[Callable] = None,  # prompts -> (P, D)
        exemplar_lookup: Optional[Callable] = None,  # name -> (D,) feature
    ):
        self.original = scene
        self.scene = scene
        self.features = features
        self.text_encoder = text_encoder
        self.exemplar_lookup = exemplar_lookup
        self.view: Optional[str] = None
        self.last_mask: Optional[np.ndarray] = None

    def _query_mask(self, obj: str) -> Optional[np.ndarray]:
        from tpugs.query.text import get_mask3d

        if self.text_encoder is not None:
            q = self.text_encoder([obj, "other"])
            pos, neg = q[:1], q[1:]
        elif self.exemplar_lookup is not None:
            f = self.exemplar_lookup(obj)
            if f is None:
                return None
            pos = jnp.asarray(f, jnp.float32)[None]
            neg = -pos
        else:
            return None
        mask, _ = get_mask3d(self.features, pos, neg)
        return np.asarray(mask)

    def apply(self, cmd: dict) -> dict:
        from tpugs.query.masks import recolor, segment_by_opacity

        c = cmd.get("command", "unknown")
        if c == "segment":
            mask = self._query_mask(cmd.get("object", ""))
            if mask is None:
                return {"status": "no-query-backend"}
            self.last_mask = mask
            self.scene = segment_by_opacity(self.scene, mask)
            return {"status": "ok", "selected": int(mask.sum())}
        if c == "reset_segmentation":
            self.scene = self.scene.replace(
                logit_opacities=self.original.logit_opacities
            )
            return {"status": "ok"}
        if c == "change_color":
            color = COLOR_TO_RGB.get(cmd.get("color", ""), None)
            if color is None:
                return {"status": "unknown-color"}
            mask = self._query_mask(cmd.get("object", ""))
            if mask is None:
                return {"status": "no-query-backend"}
            self.scene = recolor(self.scene, mask, color)
            return {"status": "ok", "recolored": int(mask.sum())}
        if c == "reset_color":
            self.scene = self.scene.replace(
                sh0=self.original.sh0, shN=self.original.shN
            )
            return {"status": "ok"}
        if c == "change_view":
            self.view = cmd.get("view", "front")
            return {"status": "ok", "view": self.view}
        if c == "exit":
            return {"status": "exit"}
        return {"status": "unknown"}


def main(
    data_dir: str = "./data/garden",
    checkpoint: str = "./data/garden/ckpts/ckpt_29999_rank0.pt",
    results_dir: str = "./results/garden",
    format: str = "gsplat",
    data_factor: int = 4,
    feature: str = "lseg",
    llm: str = "",  # "hf:<path>" | "tiny-random" | "" (grammar parser)
):  # pragma: no cover - interactive
    import os

    import cv2

    from tpugs.apps.viewer import Viewer
    from tpugs.io.checkpoints import load_checkpoint

    scene, cams, _ = load_checkpoint(checkpoint, data_dir, format, data_factor)
    feats = np.load(os.path.join(results_dir, f"features_{feature}.npz"))[
        "features"
    ]
    from tpugs.apps.llm_backend import make_backend

    assistant = Assistant(llm=make_backend(llm))
    editor = SceneEditor(scene, jnp.asarray(feats))
    viewer = Viewer(
        scene, np.asarray(cams.Ks[0]), cams.width, cams.height,
        viewmats=np.asarray(cams.viewmats),
    )

    typed = ""
    prompt_mode = False
    win = "tpugs viewer+llm"
    cv2.namedWindow(win, cv2.WINDOW_NORMAL)
    while True:
        viewer.scene = editor.scene
        frame = viewer.render()
        if prompt_mode:
            cv2.putText(
                np.ascontiguousarray(frame), "> " + typed, (10, 30),
                cv2.FONT_HERSHEY_SIMPLEX, 0.8, (255, 255, 0), 2,
            )
        cv2.imshow(win, frame[..., ::-1])
        key = cv2.waitKeyEx(30)
        if key < 0:
            continue
        ch = chr(key & 0xFF)
        if prompt_mode:
            if ch in ("\r", "\n"):
                result = editor.apply(assistant.ask(typed))
                if result.get("status") == "exit":
                    break
                if editor.view in ("top", "front", "right"):
                    viewer.state.set_canonical(editor.view, viewer.frame)
                typed, prompt_mode = "", False
            elif ch == "\x08":
                typed = typed[:-1]
            else:
                typed += ch
        elif ch == "`":
            prompt_mode = True
        elif not viewer.handle_key(ch):
            break
    cv2.destroyAllWindows()


if __name__ == "__main__":
    from tpugs.utils.cli import cli

    cli(main)
