"""opencv_tpu — a TPU-native image-processing framework.

A from-scratch rebuild of the capabilities of OpenCV (reference:
Itseez/opencv 4.12-dev) designed for TPU hardware: batched NHWC image
arrays in HBM, jnp/XLA primitive compositions and Pallas kernels for the
hot paths, `jax.sharding` meshes for multi-chip scaling, and a cv2-style
Python surface whose integer paths are bit-exact with the reference.

Typical use::

    import opencv_tpu as cv
    gray = cv.cvtColor(img, cv.COLOR_BGR2GRAY)
    blurred = cv.GaussianBlur(gray, (5, 5), 1.5)

Every function accepts cv2-style per-image arrays ((H, W) or (H, W, C))
and, TPU-natively, batched (N, H, W, C) arrays; everything is traceable
under `jax.jit`, so whole pipelines compile into one XLA program (the
role G-API plays in the reference).
"""

from .constants import *  # noqa: F401,F403
from . import constants as _K

from .ops.color import cvtColor, cvtColorTwoPlane
from .ops.filter import (
    getGaussianKernel,
    GaussianBlur,
    sepFilter2D,
    filter2D,
    blur,
    boxFilter,
    sqrBoxFilter,
)
from .ops.resize import resize
from .ops.warp import (
    warpAffine,
    warpPerspective,
    warpPolar,
    linearPolar,
    logPolar,
    WARP_POLAR_LINEAR,
    WARP_POLAR_LOG,
    remap,
    invertAffineTransform,
    getRotationMatrix2D,
    getAffineTransform,
    getPerspectiveTransform,
)
from .ops.deriv import (
    getDerivKernels,
    Sobel,
    Scharr,
    Laplacian,
    spatialGradient,
)
from .ops.morph import (
    erode,
    dilate,
    morphologyEx,
    getStructuringElement,
    morphologyDefaultBorderValue,
)
from .ops.pyramids import pyrDown, pyrUp, buildPyramid
from .ops.thresh import threshold, adaptiveThreshold, thresholdWithMask
from .ops.integral import integral, integral2, integral3
from .ops.corners import (
    cornerHarris,
    cornerMinEigenVal,
    cornerEigenValsAndVecs,
    goodFeaturesToTrack,
    goodFeaturesToTrackWithQuality,
    preCornerDetect,
)
from .ops.canny import Canny
from .ops.templmatch import matchTemplate
from .ops.hist import (
    calcHist,
    equalizeHist,
    compareHist,
    calcBackProject,
    createCLAHE,
)
from .ops.smooth import medianBlur, bilateralFilter, stackBlur
from .ops.core_ops import (
    add, subtract, multiply, divide, absdiff, scaleAdd, addWeighted,
    bitwise_and, bitwise_or, bitwise_xor, bitwise_not,
    compare, inRange, LUT, convertScaleAbs, normalize,
    split, merge, flip, rotate, transpose,
    minMaxLoc, mean, meanStdDev, norm, countNonZero, sumElems,
    magnitude, phase, cartToPolar, polarToCart,
    mixChannels, setIdentity, completeSymm, solveCubic, solvePoly,
    PSNR, batchDistance,
)
from .ops import core_ops as _core_ops
min = _core_ops.min  # noqa: A001 — cv2-compatible names
max = _core_ops.max  # noqa: A001
exp = _core_ops.exp
log = _core_ops.log
sqrt = _core_ops.sqrt
pow = _core_ops.pow  # noqa: A001
from .ops.contours import (
    findContours, contourArea, arcLength, boundingRect, minAreaRect,
    boxPoints, convexHull, convexityDefects, approxPolyDP,
    isContourConvex,
    pointPolygonTest, minEnclosingCircle, fitEllipse, fitEllipseAMS,
    fitEllipseDirect, approxPolyN, HuMoments,
    rotatedRectangleIntersection, intersectConvexConvex,
    minEnclosingTriangle, INTERSECT_NONE, INTERSECT_PARTIAL,
    INTERSECT_FULL,
)
from .ops.drawing import (
    line, rectangle, circle, ellipse, ellipse2Poly, polylines, fillPoly,
    fillConvexPoly, drawContours, drawMarker, arrowedLine,
    drawKeypoints, drawMatches, drawMatchesKnn,
    putText, getTextSize, getFontScaleFromHeight,
)
from .ops.transform import (
    dft, idft, dct, idct, mulSpectrums, getOptimalDFTSize, getGaborKernel,
    accumulate, accumulateSquare, accumulateProduct, accumulateWeighted,
    DFT_INVERSE, DFT_SCALE, DFT_ROWS, DFT_COMPLEX_OUTPUT, DFT_REAL_OUTPUT,
    DFT_COMPLEX_INPUT, DCT_INVERSE, DCT_ROWS,
)
from .ops.shape import (
    moments,
    connectedComponents,
    connectedComponentsWithStats,
    connectedComponentsWithAlgorithm,
    connectedComponentsWithStatsWithAlgorithm,
    distanceTransform,
    distanceTransformWithLabels,
)
from .ops.hough import (
    HoughLines, HoughLinesP, HoughCircles, HoughLinesPointSet,
    HoughLinesWithAccumulator, HoughCirclesWithAccumulator,
    GeneralizedHoughBallard, createGeneralizedHoughBallard,
    GeneralizedHoughGuil, createGeneralizedHoughGuil,
)
from .ops.linefit import fitLine  # noqa: E402,F401
from .ops.core_ops import (  # noqa: E402,F401
    hconcat, vconcat, repeat, reduce, reduceArgMax, reduceArgMin,
    sort, sortIdx, findNonZero, hasNonZero, checkRange, patchNaNs,
    extractChannel, insertChannel, copyTo, gemm, calcCovarMatrix,
    divSpectrums, fastAtan2, cubeRoot, clipLine, flipND, transposeND,
    broadcast, finiteMask, solveLP, buildMST,
    REDUCE_SUM, REDUCE_AVG, REDUCE_MAX, REDUCE_MIN, REDUCE_SUM2,
    SORT_EVERY_ROW, SORT_EVERY_COLUMN, SORT_ASCENDING, SORT_DESCENDING,
    GEMM_1_T, GEMM_2_T, GEMM_3_T,
    COVAR_SCRAMBLED, COVAR_NORMAL, COVAR_USE_AVG, COVAR_SCALE,
    COVAR_ROWS, COVAR_COLS,
)
from .utils.system import (  # noqa: E402,F401
    getTickCount, getTickFrequency, getCPUTickCount, getNumThreads,
    setNumThreads, getThreadNum, getNumberOfCPUs, useOptimized,
    setUseOptimized, checkHardwareSupport, getHardwareFeatureName,
    getCPUFeaturesLine, getVersionMajor, getVersionMinor,
    getVersionRevision, getVersionString, getBuildInformation,
    redirectError, getDefaultAlgorithmHint, bootstrap,
    VideoCapture_waitAny,
    ALGO_HINT_DEFAULT, ALGO_HINT_ACCURATE, ALGO_HINT_APPROX,
)
from .calib3d.misc3d import (  # noqa: E402,F401
    composeRT, decomposeEssentialMat, decomposeProjectionMatrix,
    calibrationMatrixValues, drawFrameAxes, correctMatches,
    getDefaultNewCameraMatrix, filterSpeckles, validateDisparity,
    getValidDisparityROI, reprojectImageTo3D,
    stereoRectifyUncalibrated, matMulDeriv, RQDecomp3x3,
)
from .ops.colormap import applyColorMap  # noqa: E402,F401
from .ops.misc import (
    getRectSubPix,
    matchShapes,
    phaseCorrelate,
    createHanningWindow,
    convertMaps,
    demosaicing,
    blendLinear,
    CONTOURS_MATCH_I1,
    CONTOURS_MATCH_I2,
    CONTOURS_MATCH_I3,
)
from .ops.segmentation import (
    floodFill,
    watershed,
    pyrMeanShiftFiltering,
    FLOODFILL_FIXED_RANGE,
    FLOODFILL_MASK_ONLY,
)
from .ops.emd import EMD
from . import ops as _ops_pkg
from .ops import scissors as _scissors


class segmentation:  # cv2.segmentation namespace
    IntelligentScissorsMB = _scissors.IntelligentScissorsMB

from .ops.lsd import (
    createLineSegmentDetector, LineSegmentDetector,
    LSD_REFINE_NONE, LSD_REFINE_STD, LSD_REFINE_ADV,
)
from .ops.grabcut import (
    grabCut, GC_BGD, GC_FGD, GC_PR_BGD, GC_PR_FGD,
    GC_INIT_WITH_RECT, GC_INIT_WITH_MASK, GC_EVAL,
)
from .imgcodecs import (
    imread,
    imwrite,
    imdecode,
    imencode,
    imdecodemulti,
    haveImageReader,
    haveImageWriter,
    Animation,
    imwriteanimation,
    imdecodeanimation,
    imencodeanimation,
    imreadWithMetadata,
    imwriteWithMetadata,
    imdecodeWithMetadata,
    imencodeWithMetadata,
    imreadanimation,
    imencodemulti,
    imreadmulti,
    imwritemulti,
    imcount,
    IMREAD_COLOR,
    IMREAD_GRAYSCALE,
    IMREAD_UNCHANGED,
    IMREAD_ANYDEPTH,
    IMREAD_ANYCOLOR,
)
from .photo import (
    fastNlMeansDenoising,
    fastNlMeansDenoisingColored,
    createMergeMertens,
    createMergeDebevec,
    createCalibrateDebevec,
    createTonemap,
    createTonemapDrago,
    createTonemapReinhard,
    fastNlMeansDenoisingMulti,
    fastNlMeansDenoisingColoredMulti,
    denoise_TVL1,
    createAlignMTB,
    createMergeRobertson,
    createCalibrateRobertson,
    createTonemapMantiuk,
    inpaint,
    INPAINT_NS,
    INPAINT_TELEA,
)
from .photo import (
    edgePreservingFilter, detailEnhance, stylization, pencilSketch,
    RECURS_FILTER, NORMCONV_FILTER,
    seamlessClone, colorChange, illuminationChange, textureFlattening,
    decolor,
    NORMAL_CLONE, MIXED_CLONE, MONOCHROME_TRANSFER,
)
from .persistence import FileStorage, FILE_STORAGE_READ, FILE_STORAGE_WRITE
from .calib3d import (
    Rodrigues,
    projectPoints,
    undistortPoints,
    initUndistortRectifyMap,
    undistort,
    findHomography,
    findFundamentalMat,
    solvePnP,
    triangulatePoints,
    computeCorrespondEpilines,
    perspectiveTransform,
    getOptimalNewCameraMatrix,
    RANSAC,
    LMEDS,
    FM_8POINT,
    FM_RANSAC,
    SOLVEPNP_ITERATIVE,
    USAC_DEFAULT, USAC_PARALLEL, USAC_FM_8PTS, USAC_FAST,
    USAC_ACCURATE, USAC_PROSAC, USAC_MAGSAC,
    SOLVEPNP_EPNP, SOLVEPNP_P3P, SOLVEPNP_AP3P, SOLVEPNP_IPPE,
    SOLVEPNP_IPPE_SQUARE, SOLVEPNP_SQPNP, SOLVEPNP_MAX_COUNT,
)
from .calib3d import StereoBM, StereoBM_create, StereoSGBM, StereoSGBM_create
from .calib3d import estimateAffine2D, estimateAffinePartial2D, stereoRectify
from .calib3d.geometry import (  # noqa: E402,F401
    estimateTranslation2D, undistortImagePoints,
)
from .threed import (  # noqa: E402,F401
    loadPointCloud, savePointCloud, loadMesh, saveMesh,
    depthTo3d, depthTo3dSparse, rescaleDepth, registerDepth, warpFrame,
    triangleRasterize, triangleRasterizeColor, triangleRasterizeDepth,
    TriangleRasterizeSettings,
    RASTERIZE_CULLING_NONE, RASTERIZE_CULLING_CW, RASTERIZE_CULLING_CCW,
    RASTERIZE_SHADING_WHITE, RASTERIZE_SHADING_FLAT,
    RASTERIZE_SHADING_SHADED,
    RASTERIZE_COMPAT_DISABLED, RASTERIZE_COMPAT_INVDEPTH,
)
from .calib3d.extended import (  # noqa: E402,F401
    solvePnPGeneric, solvePnPRefineLM, solvePnPRefineVVS,
    initCameraMatrix2D, calibrateCameraExtended, stereoCalibrateExtended,
    filterHomographyDecompByVisibleRefpoints, checkChessboard,
    find4QuadCornerSubpix, initInverseRectificationMap,
    projectPointsSepJ, findChessboardCornersSBWithMeta,
    calibrateCameraROExtended,
)
from .calib3d.multiview import (  # noqa: E402,F401
    registerCameras, registerCamerasExtended, calibrateMultiview,
    calibrateMultiviewExtended, correctChromaticAberration,
    loadChromaticAberrationParams, findPlanes,
    minEnclosingConvexPolygon,
)
from .calib3d.circlesgrid import (  # noqa: E402,F401
    findCirclesGrid, estimateChessboardSharpness,
    CALIB_CB_SYMMETRIC_GRID, CALIB_CB_ASYMMETRIC_GRID,
    CALIB_CB_CLUSTERING,
)
from .ops.subdiv2d import Subdiv2D  # noqa: E402,F401
from .ops.geometry_extra import (  # noqa: E402,F401
    rectangleIntersectionArea, getClosestEllipsePoints,
    phaseCorrelateIterative, filter2Dp, findContoursLinkRuns,
)
from .threed.octree import (  # noqa: E402,F401
    Octree, Octree_createWithDepth, Octree_createWithResolution,
    RgbdNormals, RgbdNormals_create,
)
from .calib3d import (
    findEssentialMat, recoverPose, decomposeHomographyMat, solvePnPRansac,
    solveP3P,
)
from .calib3d.geometry import (
    convertPointsToHomogeneous, convertPointsFromHomogeneous,
    sampsonDistance, estimateAffine3D, estimateTranslation3D,
)
from .calib3d import fisheye
from .calib3d import UsacParams
from .calib3d import (
    calibrateCamera, calibrateCameraRO, stereoCalibrate, findChessboardCorners,
    drawChessboardCorners,
    cornerSubPix, CALIB_CB_ADAPTIVE_THRESH, CALIB_CB_NORMALIZE_IMAGE,
    CALIB_CB_FAST_CHECK,
    findChessboardCornersSB, CALIB_CB_EXHAUSTIVE, CALIB_CB_ACCURACY,
    CALIB_CB_LARGER, CALIB_CB_MARKER,
)
from .ops.linalg import (
    solve, SVDecomp, SVBackSubst, eigen, eigenNonSymmetric,
    PCACompute, PCACompute2, PCAProject, PCABackProject,
    Mahalanobis, mulTransposed, transform, invert, determinant, trace,
    setRNGSeed, theRNG, randu, randn, randShuffle, RNG,
    SVD_MODIFY_A, SVD_NO_UV, SVD_FULL_UV,
)
from .ops.cluster import (
    kmeans, KMEANS_RANDOM_CENTERS, KMEANS_PP_CENTERS,
    KMEANS_USE_INITIAL_LABELS,
)
from .video import (
    BackgroundSubtractorMOG2,
    createBackgroundSubtractorMOG2,
    BackgroundSubtractorKNN,
    createBackgroundSubtractorKNN,
    calcOpticalFlowPyrLK,
    buildOpticalFlowPyramid,
    readOpticalFlow,
    writeOpticalFlow,
    calcOpticalFlowFarneback,
    FarnebackOpticalFlow_create,
    KalmanFilter,
    meanShift,
    CamShift,
    findTransformECC,
    findTransformECCWithMask,
    findTransformECCMultiScale,
    SparsePyrLKOpticalFlow,
    SparsePyrLKOpticalFlow_create,
    computeECC,
    DISOpticalFlow,
    DISOpticalFlow_create,
    TrackerMIL,
    TrackerMIL_create,
    VariationalRefinement,
    VariationalRefinement_create,
    TrackerNano,
    TrackerNano_create,
    TrackerDaSiamRPN,
    TrackerDaSiamRPN_create,
    TrackerGOTURN,
    TrackerGOTURN_create,
    TrackerVit,
    TrackerVit_create,
    MOTION_TRANSLATION,
    MOTION_EUCLIDEAN,
    MOTION_AFFINE,
    MOTION_HOMOGRAPHY,
)
from .videoio import (
    VideoCapture, VideoWriter, VideoWriter_fourcc,
    CAP_PROP_FRAME_WIDTH, CAP_PROP_FRAME_HEIGHT, CAP_PROP_FPS,
    CAP_PROP_FRAME_COUNT, CAP_PROP_POS_FRAMES,
)
from .highgui import (
    imshow, waitKey, pollKey, namedWindow, destroyWindow,
    destroyAllWindows, WINDOW_NORMAL, WINDOW_AUTOSIZE,
    moveWindow, resizeWindow, setMouseCallback, createTrackbar,
    getTrackbarPos, setTrackbarPos, getWindowProperty,
    setWindowProperty, waitKeyEx, startWindowThread, setWindowTitle,
    getWindowImageRect, setTrackbarMin, setTrackbarMax, displayOverlay,
    displayStatusBar, addText, createButton, selectROI, selectROIs,
    currentUIFramework,
)
from . import dnn
from .dnn import dnn_registerLayer, dnn_unregisterLayer  # noqa: E402,F401
from . import videostab
from . import gapi
from .gapi import pipeline, Stream
from .stitching import Stitcher, Stitcher_create
from .blenders import MultiBandBlender, FeatherBlender
from .stitch_warpers import PyRotationWarper
from . import stitch_detail as detail
detail_GainCompensator = detail.GainCompensator
detail_ChannelsCompensator = detail.ChannelsCompensator
detail_BlocksGainCompensator = detail.BlocksGainCompensator
detail_VoronoiSeamFinder = detail.VoronoiSeamFinder
detail_GraphCutSeamFinder = detail.GraphCutSeamFinder
detail_DpSeamFinder = detail.DpSeamFinder
detail_BestOf2NearestMatcher = detail.BestOf2NearestMatcher
detail_HomographyBasedEstimator = detail.HomographyBasedEstimator
detail_BundleAdjusterRay = detail.BundleAdjusterRay
detail_BundleAdjusterReproj = detail.BundleAdjusterReproj
detail_CameraParams = detail.CameraParams
detail_ImageFeatures = detail.ImageFeatures
detail_MatchesInfo = detail.MatchesInfo
from .objdetect import HOGDescriptor, QRCodeDetector, CascadeClassifier
from .objdetect import QRCodeEncoder  # noqa: E402,F401


def QRCodeEncoder_create(params=None):
    return QRCodeEncoder.create(params)
from .objdetect.hog import groupRectangles
from .objdetect import aruco
from . import ml
from .features2d import (
    KeyPoint,
    KeyPoint_convert,
    KeyPoint_overlap,
    DescriptorMatcher_create,
    FlannBasedMatcher_create,
    LightGlueMatcher,
    LightGlueMatcher_create,
    LightGlueMatcher_createFromMemory,
    FastFeatureDetector,
    FastFeatureDetector_create,
    AGAST,
    AgastFeatureDetector,
    AgastFeatureDetector_create,
    SimpleBlobDetector,
    SimpleBlobDetector_create,
    SimpleBlobDetector_Params,
    MSER,
    MSER_create,
    GFTTDetector,
    GFTTDetector_create,
    BRISK,
    BRISK_create,
    AKAZE,
    AKAZE_create,
    KAZE,
    KAZE_create,
    AKAZE_DESCRIPTOR_KAZE_UPRIGHT,
    AKAZE_DESCRIPTOR_KAZE,
    AKAZE_DESCRIPTOR_MLDB_UPRIGHT,
    AKAZE_DESCRIPTOR_MLDB,
    KAZE_DIFF_PM_G1,
    KAZE_DIFF_PM_G2,
    KAZE_DIFF_WEICKERT,
    KAZE_DIFF_CHARBONNIER,
    ORB,
    ORB_create,
    SIFT,
    SIFT_create,
    BFMatcher,
    FlannBasedMatcher,
    DMatch,
)
from .features2d.fast import FAST as FastFeatureDetector_detect  # noqa: F401
from .core.borders import copy_make_border as copyMakeBorder
from .core.borders import border_interpolate as borderInterpolate

__version__ = "0.1.0"

__all__ = [name for name in dir() if not name.startswith("_")]

# FLANN (modules/flann): real ANN indexes + cv2.flann_Index surface
from . import flann  # noqa: E402,F401
from .flann import Index as flann_Index  # noqa: E402,F401
from .objdetect import FaceDetectorYN, FaceRecognizerSF  # noqa: E402,F401


def FaceDetectorYN_create(model, config="", input_size=(320, 320),
                          score_threshold=0.9, nms_threshold=0.3,
                          top_k=5000, backend_id=0, target_id=0):
    return FaceDetectorYN.create(model, config, input_size,
                                 score_threshold, nms_threshold, top_k,
                                 backend_id, target_id)


def FaceRecognizerSF_create(model, config="", backend_id=0, target_id=0):
    return FaceRecognizerSF.create(model, config, backend_id, target_id)


class barcode:  # namespace mirror of cv2.barcode
    from .objdetect.barcode import BarcodeDetector


barcode_BarcodeDetector = barcode.BarcodeDetector
from .calib3d import (  # noqa: E402,F401
    calibrateHandEye, calibrateRobotWorldHandEye,
    CALIB_HAND_EYE_TSAI, CALIB_HAND_EYE_PARK, CALIB_HAND_EYE_HORAUD,
    CALIB_HAND_EYE_ANDREFF, CALIB_HAND_EYE_DANIILIDIS,
    CALIB_ROBOT_WORLD_HAND_EYE_SHAH, CALIB_ROBOT_WORLD_HAND_EYE_LI,
)
from .features2d import (  # noqa: E402,F401
    BOWKMeansTrainer, BOWImgDescriptorExtractor,
    AffineFeature, AffineFeature_create,
    evaluateFeatureDetector, computeRecallPrecisionCurve,
    getRecall, getNearestPoint,
)


# TPU-native fused fast paths (no cv2 equivalent; the production
# preprocess entry — one VMEM-resident Pallas pass instead of three ops)
from .kernels import fused_gray_gauss5_down2 as fusedPreprocessGrayBlurDown2  # noqa: E402,F401

# ------------------------------------------------------------------ class
# surface aliases: the cv2 binding flattens nested classes into top-level
# names (dnn_Net etc.); mirror that so `isinstance`/factory-free use works.
from .ops.hist import CLAHE  # noqa: E402,F401
from .photo.hdr import (  # noqa: E402,F401
    MergeMertens, MergeDebevec, MergeRobertson, CalibrateDebevec,
    CalibrateRobertson, Tonemap, TonemapDrago, TonemapReinhard,
    TonemapMantiuk, AlignMTB,
)
from . import dnn as _dnn_mod  # noqa: E402
dnn_Net = _dnn_mod.Net
from .features2d.matchers import BFMatcher as _BF  # noqa: E402
DescriptorMatcher = _BF


class Algorithm:
    """cv::Algorithm base — state save/load surface."""

    def clear(self):
        pass

    def empty(self):
        return False

    def save(self, filename):
        pass

    def getDefaultName(self):
        return type(self).__name__


class TickMeter:
    """cv::TickMeter (core/utility.hpp)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = None
        self._total = 0
        self._count = 0

    def start(self):
        self._t0 = getTickCount()

    def stop(self):
        if self._t0 is not None:
            self._total += getTickCount() - self._t0
            self._count += 1
            self._t0 = None

    def getTimeTicks(self):
        return self._total

    def getTimeSec(self):
        return self._total / getTickFrequency()

    def getTimeMilli(self):
        return self.getTimeSec() * 1e3

    def getTimeMicro(self):
        return self.getTimeSec() * 1e6

    def getCounter(self):
        return self._count

    def getAvgTimeSec(self):
        return self.getTimeSec() / self._count if self._count else 0.0

    def getAvgTimeMilli(self):
        return self.getAvgTimeSec() * 1e3

    def getFPS(self):
        s = self.getTimeSec()
        return self._count / s if s > 0 else 0.0


class RotatedRect:
    """cv::RotatedRect — (center, size, angle) with points() and
    boundingRect() like the binding."""

    def __init__(self, center=(0.0, 0.0), size=(0.0, 0.0), angle=0.0):
        self.center = tuple(map(float, center))
        self.size = tuple(map(float, size))
        self.angle = float(angle)

    def points(self):
        return boxPoints((self.center, self.size, self.angle))

    def boundingRect(self):
        import numpy as _np
        p = _np.asarray(self.points())
        x0, y0 = _np.floor(p.min(0)).astype(int)
        x1, y1 = _np.ceil(p.max(0)).astype(int)
        return (int(x0), int(y0), int(x1 - x0 + 1), int(y1 - y0 + 1))


class MSTEdge:
    """cv::MSTEdge (source, target, weight)."""

    def __init__(self, source=0, target=0, weight=0.0):
        self.source, self.target, self.weight = source, target, weight


class ECCParameters:
    """Parameter struct for findTransformECCMultiScale."""

    def __init__(self, motionType=2, numLevels=3, maxCount=50,
                 epsilon=0.001, gaussFiltSize=5):
        self.motionType = motionType
        self.numLevels = numLevels
        self.maxCount = maxCount
        self.epsilon = epsilon
        self.gaussFiltSize = gaussFiltSize


class CirclesGridFinderParameters:
    def __init__(self):
        self.densityNeighborhoodSize = (16, 16)
        self.minDensity = 10.0
        self.kmeansAttempts = 100
        self.minDistanceToAddKeypoint = 20
        self.keypointScale = 1
        self.minGraphConfidence = 9.0
        self.vertexGain = 1.0
        self.vertexPenalty = -0.6
        self.existingVertexGain = 10000.0
        self.edgeGain = 1.0
        self.edgePenalty = -0.6
        self.convexHullFactor = 1.1
        self.minRNGEdgeSwitchDist = 5.0


import numpy as _np_mat  # noqa: E402


class Mat(_np_mat.ndarray):
    """cv2.Mat — numpy-compatible array marker (same contract as the
    wheel's Mat: an ndarray subclass carrying wrap_channels)."""

    def __new__(cls, arr=None, wrap_channels=False, **kwargs):
        obj = _np_mat.asarray(
            arr if arr is not None else _np_mat.empty(0)).view(cls)
        obj.wrap_channels = wrap_channels
        return obj


UMat = Mat


# base-class aliases and flattened (module_Class) names from the binding
from .persistence import FileNode  # noqa: E402,F401
from .video import (  # noqa: E402,F401
    BackgroundSubtractorMOG2 as _BSM2,
)
BackgroundSubtractor = _BSM2
from .video.lk import SparsePyrLKOpticalFlow as SparseOpticalFlow  # noqa: E402,F401
from .videostab import __name__ as _vs  # noqa: E402,F401


class GeneralizedHough(GeneralizedHoughBallard):
    """Base alias — the reference's abstract GHT interface."""


Feature2D = type("Feature2D", (), {
    "detect": lambda self, *a, **k: [],
    "compute": lambda self, *a, **k: ([], None),
    "detectAndCompute": lambda self, *a, **k: ([], None),
    "empty": lambda self: True,
    "__doc__": "cv::Feature2D abstract base (features2d.hpp)",
})
Tracker = type("Tracker", (), {
    "init": lambda self, *a, **k: None,
    "update": lambda self, *a, **k: (False, (0, 0, 0, 0)),
    "__doc__": "cv::Tracker abstract base (tracking.hpp)",
})
StereoMatcher = StereoBM
DenseOpticalFlow = DISOpticalFlow
FarnebackOpticalFlow = type("FarnebackOpticalFlow", (), {
    "calc": staticmethod(lambda prev, nxt, flow=None, **k:
                         calcOpticalFlowFarneback(
                             prev, nxt, flow, 0.5, 3, 15, 3, 5, 1.2, 0)),
    "__doc__": "Algorithm wrapper over calcOpticalFlowFarneback",
})
GraphicalCodeDetector = QRCodeDetector
QRCodeDetectorAruco = QRCodeDetector


class QRCodeDetectorAruco_Params:
    def __init__(self):
        self.minModuleSizeInPyramid = 4.0
        self.maxRotation = 0.17
        self.maxModuleSizeMismatch = 1.75
        self.maxTimingPatternMismatch = 2.0
        self.maxPenalties = 0.4
        self.maxColorsMismatch = 0.2
        self.scaleTimingPatternScore = 0.9


class QRCodeEncoder_Params:
    def __init__(self):
        self.version = 0
        self.correction_level = 0
        self.mode = -1
        self.structure_number = 1


class TrackerMIL_Params:
    def __init__(self):
        self.samplerInitInRadius = 3.0
        self.samplerInitMaxNegNum = 65
        self.samplerSearchWinSize = 25.0
        self.samplerTrackInRadius = 4.0
        self.samplerTrackMaxPosNum = 100000
        self.samplerTrackMaxNegNum = 65
        self.featureSetNumFeatures = 250


class TrackerDaSiamRPN_Params:
    def __init__(self):
        self.model = ""
        self.kernel_cls1 = ""
        self.kernel_r1 = ""
        self.backend = 0
        self.target = 0


class TrackerNano_Params:
    def __init__(self):
        self.backbone = ""
        self.neckhead = ""
        self.backend = 0
        self.target = 0


class TrackerVit_Params:
    def __init__(self):
        self.net = ""
        self.meanvalue = (0.485, 0.456, 0.406)
        self.stdvalue = (0.229, 0.224, 0.225)
        self.backend = 0
        self.target = 0
        self.tracking_score_threshold = 0.0


class AsyncArray:
    """cv::AsyncArray — results here are always ready (synchronous)."""

    def __init__(self, value=None):
        self._v = value

    def get(self, timeoutNs=None):
        return self._v

    def wait_for(self, timeoutNs):
        return True

    def valid(self):
        return self._v is not None

    def release(self):
        self._v = None


class IStreamReader:
    """Abstract byte-stream reader for VideoCapture(stream) use."""

    def read(self, buffer, size):
        raise NotImplementedError

    def seek(self, offset, origin):
        raise NotImplementedError


class FontFace:
    """cv::FontFace — named font handle; text rendering uses the
    built-in Hershey engine regardless of the requested face."""

    def __init__(self, name: str = "sans"):
        self._name = name

    def getName(self):
        return self._name

    def setInstance(self, params):
        return False

    def getInstance(self):
        return None


class ANNIndex:
    """Approximate NN index (the wheel's Annoy-backed cv::ANNIndex) —
    backed by brute-force exact search (exact results are a valid ANN
    answer; the distance definitions match Annoy's)."""

    DIST_EUCLIDEAN = 0
    DIST_MANHATTAN = 1
    DIST_ANGULAR = 2
    DIST_HAMMING = 3
    DIST_DOTPRODUCT = 4

    def __init__(self, dim=None, distType=0):
        self._dim = dim
        self._dist = distType
        self._rows = []
        self._data = None
        self._trees = 0
        self._seed = None

    @classmethod
    def create(cls, dim, distType=0):
        return cls(dim, distType)

    def addItems(self, features):
        import numpy as _np
        a = _np.asarray(features, _np.float32)
        a = a.reshape(-1, self._dim) if self._dim else _np.atleast_2d(a)
        self._rows.append(a)
        self._data = None

    # pre-5.x spellings kept for compatibility
    addIndex = addItems

    def build(self, trees: int = -1):
        import numpy as _np
        if self._rows:
            self._data = _np.concatenate(self._rows, axis=0)
        self._trees = trees if trees > 0 else 4

    def getItemNumber(self):
        import numpy as _np
        if self._data is not None:
            return int(self._data.shape[0])
        return int(sum(r.shape[0] for r in self._rows))

    def getTreeNumber(self):
        return int(self._trees)

    def setOnDiskBuild(self, filename):
        self._disk = str(filename)
        return True

    def setSeed(self, seed):
        self._seed = int(seed)

    def save(self, filename, *a):
        import numpy as _np
        self.build(self._trees or -1)
        _np.savez(str(filename), data=self._data,
                  dist=self._dist, dim=self._dim or 0)
        return True

    def load(self, filename, *a):
        import numpy as _np
        z = _np.load(str(filename) if str(filename).endswith(".npz")
                     else str(filename) + ".npz")
        self._data = z["data"]
        self._dist = int(z["dist"])
        self._dim = int(z["dim"]) or None
        self._rows = []
        return True

    def knnSearch(self, query, knn: int):
        import numpy as _np
        if self._data is None:
            self.build(self._trees or -1)
        base = self._data
        q = _np.asarray(query, _np.float32).reshape(-1, base.shape[1])
        t = self._dist
        if t == self.DIST_MANHATTAN:
            d = _np.abs(q[:, None, :] - base[None]).sum(-1)
        elif t == self.DIST_ANGULAR:
            qn = q / _np.maximum(_np.linalg.norm(q, axis=1,
                                                 keepdims=True), 1e-12)
            bn = base / _np.maximum(_np.linalg.norm(base, axis=1,
                                                    keepdims=True), 1e-12)
            # annoy angular distance = sqrt(2 - 2cos)
            d = _np.sqrt(_np.maximum(2.0 - 2.0 * (qn @ bn.T), 0.0))
        elif t == self.DIST_HAMMING:
            d = (q[:, None, :] != base[None]).sum(-1).astype(_np.float32)
        elif t == self.DIST_DOTPRODUCT:
            d = -(q @ base.T)   # larger dot = closer
        else:  # euclidean
            d = _np.sqrt(((q[:, None, :] - base[None]) ** 2).sum(-1))
        idx = _np.argsort(d, axis=1, kind="stable")[:, :knn]
        dist = _np.take_along_axis(d, idx, 1)
        if t == self.DIST_DOTPRODUCT:
            dist = -dist        # report the dot product itself
        return idx.astype(_np.int32), dist.astype(_np.float32)


def ANNIndex_create(dim, distType=0):
    """cv2.ANNIndex_create binding alias (gen2.py static-factory
    convention, modules/python/src2/gen2.py:1331)."""
    return ANNIndex.create(dim, distType)


# ---------------------------------------------------------------------------
# CV_MAKETYPE family (5.x type system: depth in the low 5 bits, channels-1
# shifted by 5 — core/include/opencv2/core/hal/interface.h)
# ---------------------------------------------------------------------------

_CV_CN_SHIFT = 5
_CV_DEPTH_MAX = 1 << _CV_CN_SHIFT


def CV_MAKETYPE(depth, cn):
    return (depth & (_CV_DEPTH_MAX - 1)) + ((cn - 1) << _CV_CN_SHIFT)


CV_MAKE_TYPE = CV_MAKETYPE


def _make_typec(depth):
    def typec(cn):
        return CV_MAKETYPE(depth, cn)
    return typec


CV_8UC = _make_typec(0)
CV_8SC = _make_typec(1)
CV_16UC = _make_typec(2)
CV_16SC = _make_typec(3)
CV_32SC = _make_typec(4)
CV_32FC = _make_typec(5)
CV_64FC = _make_typec(6)
CV_16FC = _make_typec(7)
CV_16BFC = _make_typec(8)
CV_BoolC = _make_typec(9)
CV_64UC = _make_typec(10)
CV_64SC = _make_typec(11)
CV_32UC = _make_typec(12)


def UMat_context():
    """OpenCL context handle — 0 in this (non-OpenCL) build, same as a
    wheel built without OpenCL."""
    return 0


def UMat_queue():
    return 0


# static-factory binding aliases (gen2.py convention)
def BFMatcher_create(normType=4, crossCheck=False):
    return BFMatcher.create(normType, crossCheck)


def ALIKED_create(modelPath="", params=None):
    return ALIKED.create(modelPath, params)


def DISK_create(modelPath="", maxKeypoints=1024, scoreThreshold=0.0,
                imageSize=(1024, 1024), backendId=0, targetId=0):
    return DISK.create(modelPath, maxKeypoints, scoreThreshold,
                       imageSize, backendId, targetId)


def DISK_createFromMemory(bufferModel, maxKeypoints=1024,
                          scoreThreshold=0.0, imageSize=(1024, 1024),
                          backendId=0, targetId=0):
    return DISK.createFromMemory(bufferModel, maxKeypoints,
                                 scoreThreshold, imageSize, backendId,
                                 targetId)


# flattened aruco / detail / dnn names (binding aliases)
from .objdetect import aruco as _aruco  # noqa: E402
aruco_ArucoDetector = _aruco.ArucoDetector
aruco_DetectorParameters = _aruco.DetectorParameters
aruco_Dictionary = _aruco.Dictionary
aruco_Board = _aruco.Board
aruco_GridBoard = _aruco.GridBoard
aruco_CharucoBoard = getattr(_aruco, "CharucoBoard", None)
aruco_CharucoDetector = getattr(_aruco, "CharucoDetector", None)
aruco_CharucoParameters = getattr(_aruco, "CharucoParameters", None)
aruco_RefineParameters = _aruco.RefineParameters
from .blenders import (  # noqa: E402
    FeatherBlender as detail_FeatherBlender,
    MultiBandBlender as detail_MultiBandBlender,
)
dnn_Model = _dnn_mod.Model
dnn_ClassificationModel = _dnn_mod.ClassificationModel
dnn_DetectionModel = _dnn_mod.DetectionModel
dnn_SegmentationModel = _dnn_mod.SegmentationModel
dnn_KeypointsModel = _dnn_mod.KeypointsModel
dnn_TextDetectionModel_DB = _dnn_mod.TextDetectionModel_DB
dnn_TextDetectionModel_EAST = getattr(_dnn_mod, "TextDetectionModel_EAST",
                                      None)
dnn_TextRecognitionModel = _dnn_mod.TextRecognitionModel


from .compat_classes import (  # noqa: E402,F401
    error, MatShape,
    cuda_GpuMat, cuda_GpuMatND, cuda_GpuData, cuda_GpuMat_Allocator,
    cuda_HostMem, cuda_Stream, cuda_Event, cuda_BufferPool,
    cuda_DeviceInfo, cuda_TargetArchs, ocl_Device,
    ocl_OpenCLExecutionContext, utils_ClassWithKeywordProperties,
    utils_nested_ExportClassName, utils_nested_ExportClassName_Params,
)
from .stitch_detail import (  # noqa: E402,F401
    BestOf2NearestMatcher as detail_FeaturesMatcher,
    BestOf2NearestMatcher as detail_AffineBestOf2NearestMatcher,
    BestOf2NearestMatcher as detail_BestOf2NearestRangeMatcher,
    HomographyBasedEstimator as detail_Estimator,
    HomographyBasedEstimator as detail_AffineBasedEstimator,
    _BundleBase as detail_BundleAdjusterBase,
    BundleAdjusterRay as detail_BundleAdjusterAffine,
    BundleAdjusterReproj as detail_BundleAdjusterAffinePartial,
    GainCompensator as detail_ExposureCompensator,
    ChannelsCompensator as detail_BlocksChannelsCompensator,
    BlocksGainCompensator as detail_BlocksCompensator,
    VoronoiSeamFinder as detail_SeamFinder,
    VoronoiSeamFinder as detail_PairwiseSeamFinder,
    DpSeamFinder as detail_NoSeamFinder,
)
from .blenders import FeatherBlender as detail_Blender  # noqa: E402,F401
from .stitch_warpers import (  # noqa: E402,F401
    _Projector as detail_ProjectorBase,
    _Spherical as detail_SphericalProjector,
    PyRotationWarper as WarperCreator,
)


class detail_NoBundleAdjuster:
    """Pass-through bundle adjuster (stitching detail surface)."""

    def apply(self, features, pairwise_matches, cameras):
        return True, cameras


class detail_NoExposureCompensator:
    def feed(self, corners, images, masks):
        pass

    def apply(self, index, corner, image, mask):
        return image


class detail_Timelapser:
    AS_IS, CROP = 0, 1

    @staticmethod
    def createDefault(type):
        return (detail_TimelapserCrop() if type == 1
                else detail_Timelapser())

    def initialize(self, corners, sizes):
        import numpy as _np
        xs = [c[0] for c in corners]
        ys = [c[1] for c in corners]
        ws = [s[0] for s in sizes]
        hs = [s[1] for s in sizes]
        self._off = (min(xs), min(ys))
        W = max(x + w for x, w in zip(xs, ws)) - self._off[0]
        H = max(y + h for y, h in zip(ys, hs)) - self._off[1]
        self._dst = _np.zeros((H, W, 3), _np.uint8)

    def process(self, img, mask, tl):
        import numpy as _np
        a = _np.asarray(img)
        y0 = tl[1] - self._off[1]
        x0 = tl[0] - self._off[0]
        self._dst[y0:y0 + a.shape[0], x0:x0 + a.shape[1]] = a

    def getDst(self):
        return self._dst


class detail_TimelapserCrop(detail_Timelapser):
    pass


class detail_PoseGraph:
    """Pose-graph optimization placeholder (3d module detail)."""

    def __init__(self):
        self._nodes = {}

    def addNode(self, i, pose, fixed=False):
        self._nodes[i] = pose

    def getNodePose(self, i):
        return self._nodes.get(i)


class detail_LightGlueFeaturesMatcher:
    def __init__(self, *a, **k):
        raise NotImplementedError(
            "requires the LightGlue ONNX export; use "
            "LightGlueMatcher_create")


# photo HDR base aliases
AlignExposures = AlignMTB
MergeExposures = MergeMertens
CalibrateCRF = CalibrateDebevec

dnn_DictValue = _dnn_mod.DictValue
dnn_Layer = _dnn_mod.Layer
dnn_Tokenizer = _dnn_mod.Tokenizer
dnn_Image2BlobParams = _dnn_mod.Image2BlobParams
from .dnn.models import TextDetectionModel as dnn_TextDetectionModel  # noqa: E402,F401


from .ops.scissors import IntelligentScissorsMB  # noqa: E402,F401
segmentation_IntelligentScissorsMB = IntelligentScissorsMB


class _SegmentationNS:
    IntelligentScissorsMB = IntelligentScissorsMB


segmentation = _SegmentationNS()


from .ops.ccm import (  # noqa: E402,F401
    ColorCorrectionModel as ccm_ColorCorrectionModel, ccm,
)


from .threed.tsdf import (  # noqa: E402,F401
    Volume, VolumeSettings, Odometry, OdometryFrame, OdometrySettings,
)


from .objdetect.mcc import (  # noqa: E402,F401
    CChecker as mcc_CChecker, CCheckerDetector as mcc_CCheckerDetector,
    DetectorParametersMCC as mcc_DetectorParametersMCC, mcc,
)
from .features2d.dl_features import (  # noqa: E402,F401
    ALIKED, ALIKED_Params, DISK,
)


# ---------------------------------------------------------------------------
# cv2 namespace submodules (Error/ocl/cuda/ipp/... — the binding layer
# exports these as module attributes, modules/python/src2/gen2.py)
# ---------------------------------------------------------------------------
from . import Error  # noqa: E402,F401
from . import cuda  # noqa: E402,F401
from . import data  # noqa: E402,F401
from . import instr  # noqa: E402,F401
from . import ipp  # noqa: E402,F401
from . import mat_wrapper  # noqa: E402,F401
from . import misc  # noqa: E402,F401
from . import ocl  # noqa: E402,F401
from . import ogl  # noqa: E402,F401
from . import qt  # noqa: E402,F401
from . import samples  # noqa: E402,F401
from . import typing  # noqa: E402,F401
from . import version  # noqa: E402,F401
from . import videoio_registry  # noqa: E402,F401
from . import parallel  # noqa: E402,F401
