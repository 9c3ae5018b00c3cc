"""Demo I/O iterators: image files/dirs and video/webcam streams.

Counterpart of vision_kit/utils/demo_helpers.py (ImageReader :11-59,
VideoReader :62-121) with the reference's hazards removed: no `eval()` of
the webcam index (demo_helpers.py:67), and the threaded video reader uses a
bounded queue with a proper prefetch thread instead of firing an unjoined
Thread per frame (demo_helpers.py:115 races `has_frame` with the consumer).
"""

from __future__ import annotations

import os
import queue
import threading

import cv2

IMAGE_EXT = (".jpg", ".jpeg", ".webp", ".bmp", ".png")
VIDEO_EXT = (".mp4", ".avi", ".mov", ".mkv")


class ImageReader:
    """Iterate (ok, bgr_image) over a single image or a directory tree."""

    def __init__(self, image_path: str, save_path: str | None = None):
        self.image_path = image_path
        if os.path.isdir(image_path):
            self.files = sorted(
                os.path.join(root, f)
                for root, _, names in os.walk(image_path)
                for f in names
                if os.path.splitext(f)[1].lower() in IMAGE_EXT
            )
        else:
            self.files = [image_path]
        self.save_path = save_path
        if save_path:
            os.makedirs(save_path, exist_ok=True)

    def save(self, image, filename: str) -> str:
        name = os.path.splitext(os.path.basename(filename))[0] + "_res.jpg"
        out = os.path.join(self.save_path, name)
        cv2.imwrite(out, image)
        return out

    def __iter__(self):
        for path in self.files:
            img = cv2.imread(path)
            yield (img is not None), img

    def __len__(self):
        return len(self.files)


class VideoReader:
    """Iterate (ok, bgr_frame) over a video file or webcam index, optionally
    prefetching frames on a reader thread so decode overlaps inference."""

    def __init__(self, video_path: str = "0", use_thread: bool = True,
                 save_path: str | None = None, prefetch: int = 4):
        self.pipe = int(video_path) if str(video_path).isnumeric() else video_path
        self.cap = cv2.VideoCapture(self.pipe)
        self.org_width = int(self.cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        self.org_height = int(self.cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        self.fps = self.cap.get(cv2.CAP_PROP_FPS) or 30.0
        self.total_frames = (
            None if str(video_path).isnumeric()
            else int(self.cap.get(cv2.CAP_PROP_FRAME_COUNT))
        )
        self.use_thread = use_thread
        self.save_path = save_path
        self.video_writer = None
        self._queue: queue.Queue = queue.Queue(maxsize=prefetch)
        self._thread = None

    def _reader(self):
        while True:
            ok, frame = self.cap.read()
            self._queue.put((ok, frame))
            if not ok:
                break

    def save(self, frame) -> None:
        if self.video_writer is None and self.save_path:
            self.video_writer = cv2.VideoWriter(
                self.save_path, cv2.VideoWriter_fourcc(*"mp4v"), self.fps,
                (frame.shape[1], frame.shape[0]),
            )
        if self.video_writer is not None:
            self.video_writer.write(frame)

    def stop(self):
        if self.video_writer:
            self.video_writer.release()
        self.cap.release()

    def __iter__(self):
        if self.use_thread and self._thread is None:
            self._thread = threading.Thread(target=self._reader, daemon=True)
            self._thread.start()
        while True:
            ok, frame = (
                self._queue.get() if self.use_thread else self.cap.read()
            )
            yield ok, frame
            if not ok:
                return

    def __len__(self):
        return self.total_frames or 0
