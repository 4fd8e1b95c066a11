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
    HoughLinesWithAccumulator,
    GeneralizedHoughBallard, createGeneralizedHoughBallard,
)
from .ops.linefit import fitLine  # noqa: E402,F401
from .ops.core_ops import (  # noqa: E402,F401
    hconcat, vconcat, repeat, reduce, reduceArgMax, reduceArgMin,
    sort, sortIdx, findNonZero, hasNonZero, checkRange, patchNaNs,
    extractChannel, insertChannel, copyTo, gemm, calcCovarMatrix,
    divSpectrums, fastAtan2, cubeRoot, clipLine, flipND, transposeND,
    broadcast, finiteMask, solveLP,
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
    redirectError, getDefaultAlgorithmHint,
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
    imreadanimation,
    imwriteanimation,
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
    SOLVEPNP_EPNP, SOLVEPNP_P3P, SOLVEPNP_AP3P, SOLVEPNP_DLS,
    SOLVEPNP_UPNP, SOLVEPNP_IPPE, SOLVEPNP_IPPE_SQUARE, SOLVEPNP_SQPNP,
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
