#!/bin/bash
# Build the reference programs for baseline measurement / oracle validation.
# Eigen-dependent programs build against shim/Eigen (MatrixXd + a cyclic-Jacobi
# EigenSolver for the GMM trainer's symmetric 12x12 eigendecompositions).
set -e
cd "$(dirname "$0")"
mkdir -p bin
REF=/root/reference
CXXFLAGS="-O2 -std=c++14 -w -I shim"
g++ $CXXFLAGS -c -o bin/main_wrap.o main_wrap.cpp
build() {
  local src=$1 out=$2
  if g++ $CXXFLAGS -Dmain=ref_main -c -o bin/$out.o $REF/$src 2> bin/$out.log \
     && g++ -o bin/$out bin/$out.o bin/main_wrap.o -lm 2>> bin/$out.log; then
    echo "OK  $out"
  else
    echo "FAIL $out (see bin/$out.log)"
  fi
}
build 7Band_GEQ.cpp geq
build FFTAlgorithm_ver2.cpp fft
build Fast_Convolution_Based_3DAudio_Impl.cpp fastconv
build NormalLMS.cpp nlms
build BNLMS.cpp bnlms
build WienerFilter_final.cpp wiener
build SpectralSubtraction_final.cpp specsub
build MFCCFeatureExtraction_auto_version1.cpp mfcc
build PitchEstimation_method1.cpp pitch1
build PitchEstimation_method2.cpp pitch2
build PitchEstimation_method3.cpp pitch3
build AnalysisAdditiveWhiteGaussianNoise.cpp awgn
build BeamForming_MVDR_ver1.cpp mvdr
build LPCEstimation.cpp lpc
build GMMAlgorithm_Train_Auto_ver2.cpp gmm_train
build GMMAlgorithm_Test_Auto_ver2.cpp gmm_test
build Viterbi_version1.cpp viterbi
