"""Reasoning-trace visualization: animated GIF of grounded video QA.

Capability parity with eval/visualization.py (VideoQAGIFGenerator): renders
the model's reasoning as an animation — typewriter text panel, video frame
seeks on each <t> evidence claim, bounding-box overlays for <box> claims,
and a playback progress bar.

Independent implementation: the reasoning trace is compiled into a step list
(text tokens + seek/box actions) by the shared tag grammar, then each step
is rasterized with PIL and assembled with imageio.
"""

from __future__ import annotations

import re
from typing import Any, Sequence

import numpy as np

from ..grounding.tags import EVIDENCE_RE


class VideoQAGIFGenerator:
    def __init__(
        self,
        panel_width: int = 480,
        font_size: int = 16,
        chars_per_frame: int = 6,
        fps: int = 8,
        box_color: tuple[int, int, int] = (255, 64, 64),
    ):
        self.panel_width = panel_width
        self.font_size = font_size
        self.chars_per_frame = chars_per_frame
        self.fps = fps
        self.box_color = box_color

    # ------------------------------------------------------------ step list

    def build_step_list(self, reasoning: str) -> list[dict[str, Any]]:
        """Compile the trace into interleaved text/action steps: plain text
        renders with a typewriter effect; each evidence claim seeks the video
        to its timestamp and overlays its box."""
        steps: list[dict[str, Any]] = []
        cursor = 0
        for m in EVIDENCE_RE.finditer(reasoning):
            if m.start() > cursor:
                steps.append({"kind": "text", "text": reasoning[cursor : m.start()]})
            obj = m.group(1).strip()
            try:
                box = [float(v) for v in m.group(2).strip("[] ").split(",")]
                t_sec = float(m.group(3))
                steps.append({"kind": "evidence", "obj": obj, "box": box, "t": t_sec,
                              "text": f"[{obj} @ {t_sec:.1f}s]"})
            except ValueError:
                steps.append({"kind": "text", "text": m.group(0)})
            cursor = m.end()
        if cursor < len(reasoning):
            steps.append({"kind": "text", "text": reasoning[cursor:]})
        return steps

    # ------------------------------------------------------------ rendering

    def _font(self):
        from PIL import ImageFont

        try:
            return ImageFont.truetype(
                "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf", self.font_size
            )
        except Exception:
            return ImageFont.load_default()

    def _text_panel(self, text: str, height: int):
        from PIL import Image, ImageDraw

        panel = Image.new("RGB", (self.panel_width, height), (24, 24, 28))
        draw = ImageDraw.Draw(panel)
        font = self._font()
        margin, y = 12, 12
        line_height = self.font_size + 4
        max_chars = max(10, (self.panel_width - 2 * margin) // (self.font_size // 2))
        lines: list[str] = []
        for paragraph in text.split("\n"):
            while len(paragraph) > max_chars:
                lines.append(paragraph[:max_chars])
                paragraph = paragraph[max_chars:]
            lines.append(paragraph)
        visible = lines[-((height - 2 * margin) // line_height) :]
        for line in visible:
            draw.text((margin, y), line, fill=(230, 230, 230), font=font)
            y += line_height
        return panel

    def _draw_box(self, frame: np.ndarray, box: Sequence[float], label: str) -> np.ndarray:
        from PIL import Image, ImageDraw

        img = Image.fromarray(frame)
        draw = ImageDraw.Draw(img)
        x1, y1, x2, y2 = [int(v) for v in box]
        draw.rectangle([x1, y1, x2, y2], outline=self.box_color, width=3)
        draw.text((x1 + 2, max(0, y1 - self.font_size - 2)), label,
                  fill=self.box_color, font=self._font())
        return np.asarray(img)

    def _progress_bar(self, frame: np.ndarray, t: float, duration: float) -> np.ndarray:
        out = frame.copy()
        h, w = out.shape[:2]
        bar_y = h - 8
        out[bar_y : bar_y + 5, :, :] = (60, 60, 60)
        fill = int(w * min(1.0, t / max(duration, 1e-6)))
        out[bar_y : bar_y + 5, :fill, :] = (80, 180, 255)
        return out

    # ------------------------------------------------------------------ API

    def create_demo_gif(
        self,
        video_path: str,
        question: str,
        response: str,
        output_path: str,
        *,
        max_frames_per_step: int = 10,
    ) -> str:
        """Render question + <think> trace + <answer> into an animated GIF."""
        import cv2
        import imageio

        from ..grounding.tags import extract_answer, extract_think

        cap = cv2.VideoCapture(video_path)
        if not cap.isOpened():
            raise ValueError(f"Could not open video: {video_path}")
        video_fps = cap.get(cv2.CAP_PROP_FPS) or 1.0
        total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        duration = total / video_fps

        def frame_at(t_sec: float) -> np.ndarray:
            idx = min(total - 1, max(0, int(round(t_sec * video_fps))))
            cap.set(cv2.CAP_PROP_POS_FRAMES, idx)
            ok, frame = cap.read()
            if not ok:
                frame = np.zeros((240, 320, 3), np.uint8)
            return cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)

        think = extract_think(response) or response
        answer = extract_answer(response)
        steps = self.build_step_list(think)
        if answer:
            steps.append({"kind": "text", "text": f"\n\nAnswer: {answer}"})

        frames_out = []
        current_frame = frame_at(0.0)
        current_t = 0.0
        accumulated = f"Q: {question}\n\n"
        for step in steps:
            if step["kind"] == "evidence":
                current_t = step["t"]
                current_frame = self._draw_box(frame_at(current_t), step["box"], step["obj"])
            text_to_add = step["text"]
            for i in range(0, max(1, len(text_to_add)), self.chars_per_frame):
                accumulated_now = accumulated + text_to_add[: i + self.chars_per_frame]
                composite = self._compose(current_frame, accumulated_now, current_t, duration)
                frames_out.append(composite)
                if len(frames_out) % max_frames_per_step == 0 and step["kind"] == "text":
                    break
            accumulated += text_to_add

        # Hold the final frame.
        final = self._compose(current_frame, accumulated, current_t, duration)
        frames_out.extend([final] * self.fps)
        cap.release()
        imageio.mimsave(output_path, frames_out, fps=self.fps, loop=0)
        return output_path

    def _compose(self, frame: np.ndarray, text: str, t: float, duration: float) -> np.ndarray:
        frame = self._progress_bar(frame, t, duration)
        h = frame.shape[0]
        panel = np.asarray(self._text_panel(text, h))
        return np.concatenate([frame, panel], axis=1)
