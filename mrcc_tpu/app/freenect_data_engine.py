"""Live ROS/Kinect data engine (optional adapter).

Parity: /root/reference/app/freenect_data_engine.py — subscribes to
``/camera/depth_registered/points`` and ``/robot/ee_pose``, throttles to
~2 FPS, hands PointCloudDTOs to the app through a size-1 queue (drop-on-full,
freenect_data_engine.py:32-34).  ROS is not present in this image, so the
rospy import is guarded; the class raises a clear error when unavailable and
exists so downstream code (app/main.py source selection) keeps the same
switch as the reference.
"""

from __future__ import annotations

import datetime
import queue
import threading

import numpy as np

from ..geometry.quaternion import xyzw_to_wxyz
from .data_engine import DataEngineInterface
from .dto import PointCloudDTO


class FreenectDataEngine(DataEngineInterface):
    def __init__(self, fps: float = 2.0,
                 cloud_topic: str = "/camera/depth_registered/points",
                 pose_topic: str = "/robot/ee_pose"):
        try:
            import rospy  # noqa: F401
            import sensor_msgs.msg  # noqa: F401
        except ImportError as e:
            raise RuntimeError(
                "FreenectDataEngine requires a ROS environment (rospy); use "
                "PickleDataEngine or SyntheticDataEngine instead.") from e
        self.fps = fps
        self.cloud_topic = cloud_topic
        self.pose_topic = pose_topic
        self._queue: "queue.Queue" = queue.Queue(maxsize=1)
        self._pose = None
        self._stop = threading.Event()

    def _on_pose(self, msg):
        p = msg.pose
        q_wxyz = xyzw_to_wxyz(np.array(
            [p.orientation.x, p.orientation.y, p.orientation.z,
             p.orientation.w]))
        self._pose = np.concatenate(
            [[p.position.x, p.position.y, p.position.z], q_wxyz])

    def _on_cloud(self, points, rgb):
        dto = PointCloudDTO(points=points, rgb=rgb,
                            timestamp=datetime.datetime.now(
                                datetime.timezone.utc),
                            ee2base_pose=self._pose)
        try:
            self._queue.put_nowait(dto)  # drop when full (reference :96-108)
        except queue.Full:
            pass

    def get(self):
        try:
            return self._queue.get(timeout=5.0)
        except queue.Empty:
            return None

    def run(self):
        import rospy
        from geometry_msgs.msg import PoseStamped
        from sensor_msgs.msg import PointCloud2

        from ..utils.ros_utils import pointcloud2_to_arrays

        rospy.init_node("mrcc_tpu_freenect", anonymous=True)
        rospy.Subscriber(self.pose_topic, PoseStamped, self._on_pose)

        period = 1.0 / self.fps
        last = [0.0]

        def cb(msg):
            import time

            now = time.time()
            if now - last[0] < period:
                return
            last[0] = now
            points, rgb = pointcloud2_to_arrays(msg)
            self._on_cloud(points, rgb)

        rospy.Subscriber(self.cloud_topic, PointCloud2, cb)

    def exit(self):
        self._stop.set()
