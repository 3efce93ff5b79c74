"""3-D visualization with plotly (reference contract:
imcui/hloc/utils/viz_3d.py:23-203 — init_figure / plot_points /
plot_camera(_colmap) / plot_reconstruction). Plotly is an optional
dependency; every entry point raises a clear error when it is missing.
"""

import numpy as np

from .geometry import qvec2rotmat

try:
    import plotly.graph_objects as go
except ImportError:  # optional dependency
    go = None


def _require_plotly():
    if go is None:
        raise ImportError(
            "3D visualization requires plotly (pip install plotly)."
        )


def to_homogeneous(points):
    pad = np.ones((points.shape[0], 1))
    return np.concatenate([points, pad], axis=-1)


def init_figure(height=800):
    """Reference parity: viz_3d.py init_figure."""
    _require_plotly()
    axes = dict(
        visible=False, showbackground=False, showgrid=False,
        showline=False, showticklabels=True, autorange=True,
    )
    fig = go.Figure()
    fig.update_layout(
        template="plotly_dark", height=height,
        scene_camera=dict(
            eye=dict(x=0.0, y=-0.1, z=-2),
            up=dict(x=0, y=-1.0, z=0),
            projection=dict(type="orthographic"),
        ),
        scene=dict(
            xaxis=axes, yaxis=axes, zaxis=axes,
            aspectmode="data", dragmode="orbit",
        ),
        margin=dict(l=0, r=0, b=0, t=0, pad=0),
        legend=dict(orientation="h", yanchor="top", y=0.99, xanchor="left",
                    x=0.1),
    )
    return fig


def plot_points(fig, pts, color="rgba(255, 0, 0, 1)", ps=2, colorscale=None,
                name=None):
    _require_plotly()
    x, y, z = pts.T
    tr = go.Scatter3d(
        x=x, y=y, z=z, mode="markers", name=name, legendgroup=name,
        marker=dict(size=ps, color=color, line_width=0.0,
                    colorscale=colorscale),
    )
    fig.add_trace(tr)


def plot_camera(fig, R, t, K, color="rgb(0, 0, 255)", name=None,
                legendgroup=None, size=1.0):
    """Camera frustum from pose + intrinsics (reference parity:
    viz_3d.py plot_camera)."""
    _require_plotly()
    W, H = K[0, 2] * 2, K[1, 2] * 2
    corners = np.array([[0, 0], [W, 0], [W, H], [0, H], [0, 0]])
    if size is not None:
        image_extent = max(size * W / 1024.0, size * H / 1024.0)
        world_extent = max(W, H) / (K[0, 0] + K[1, 1]) / 0.5
        scale = 0.5 * image_extent / world_extent
    else:
        scale = 1.0
    corners = to_homogeneous(corners) @ np.linalg.inv(K).T
    corners = (corners / 2 * scale) @ R.T + t

    x, y, z = np.concatenate(([t], corners)).T
    i = [0, 0, 0, 0]
    j = [1, 2, 3, 4]
    k = [2, 3, 4, 1]

    pyramid = go.Mesh3d(
        x=x, y=y, z=z, color=color, i=i, j=j, k=k,
        legendgroup=legendgroup, name=name, showlegend=False,
    )
    fig.add_trace(pyramid)
    triangles = np.vstack((i, j, k)).T
    vertices = np.concatenate(([t], corners))
    tri_points = np.array([vertices[i] for i in triangles.reshape(-1)])
    x, y, z = tri_points.T

    pyramid = go.Scatter3d(
        x=x, y=y, z=z, mode="lines", legendgroup=legendgroup,
        name=name, line=dict(color=color, width=1), showlegend=False,
    )
    fig.add_trace(pyramid)


def plot_camera_colmap(fig, image, camera, **kwargs):
    """Plot a camera from COLMAP records (utils/read_write_model types)."""
    from ..pipeline.triangulation import camera_K

    R = qvec2rotmat(image.qvec).T
    t = -R @ image.tvec
    plot_camera(fig, R, t, camera_K(camera), **kwargs)


def plot_cameras(fig, reconstruction_path, **kwargs):
    from .read_write_model import read_model

    cameras, images, _ = read_model(reconstruction_path)
    for image in images.values():
        plot_camera_colmap(fig, image, cameras[image.camera_id], **kwargs)


def plot_reconstruction(fig, reconstruction_path, max_reproj_error=6.0,
                        color="rgb(0, 0, 255)", name=None,
                        min_track_length=2, points=True, cameras=True,
                        points_rgb=True, cs=5):
    """Reference parity: viz_3d.py plot_reconstruction — reads a model dir
    via utils/read_write_model instead of a pycolmap.Reconstruction."""
    from .read_write_model import read_model

    cams, images, points3D = read_model(reconstruction_path)
    p3Ds = [
        p3D for p3D in points3D.values()
        if p3D.error <= max_reproj_error
        and len(p3D.image_ids) >= min_track_length
    ]
    if points and len(p3Ds):
        xyzs = np.stack([p.xyz for p in p3Ds])
        if points_rgb:
            pcolor = [f"rgb({p.rgb[0]},{p.rgb[1]},{p.rgb[2]})" for p in p3Ds]
        else:
            pcolor = color
        plot_points(fig, xyzs, color=pcolor, ps=1, name=name)
    if cameras:
        for image in images.values():
            plot_camera_colmap(
                fig, image, cams[image.camera_id], name=name,
                legendgroup=name, size=cs,
            )
