// Oracle driver: replicates fer_h264.cpp encode()/NastaviEncode() flow.
// usage: refenc in.y4m out.264 qp startFrame endFrame intraEvery [basic windowSize maxdiff]
#include <string>
#include <cstdio>
#include <cstdlib>
#include "nal.h"
#include "fileIO.h"
#include "rbsp_encoding.h"
#include "rbsp_IO.h"
#include "h264_globals.h"
#include "residual_tables.h"
#include "ref_frames.h"
#include "expgolomb.h"
#include "headers_and_parameter_sets.h"
#include "openCL_functions.h"
extern FILE* stream;
extern FILE* yuvoutput;
extern FILE* yuvinput;
static NALunit nu;
int main(int argc, char** argv) {
  if (argc < 7) { fprintf(stderr, "usage: %s in.y4m out.264 qp start end intraEvery [basic win maxdiff]\n", argv[0]); return 1; }
  _qParameter = atoi(argv[3]);
  startFrame = atoi(argv[4]);
  endFrame = atoi(argv[5]);
  IntraEvery = atoi(argv[6]);
  if (argc > 7) BasicInterEncoding = atoi(argv[7]);
  if (argc > 8) WindowSize = atoi(argv[8]);
  if (argc > 9) MAXDIFF_SET = atoi(argv[9]);
  stream = fopen(argv[2], "wb");
  yuvinput = fopen(argv[1], "rb");
  yuvoutput = fopen((std::string(argv[2]) + ".yuv").c_str(), "wb");
  if (!stream || !yuvinput || !yuvoutput) { perror("open"); return 1; }
  generate_residual_level_tables();
  init_expgolomb_UC_codes();
  InitNAL();
  InitCL();
  frameCount = 0;
  currFrameCount = 0;   // the C++/CLI Starter maintains this (fer_h264.cpp:188,196)
  nu.rbsp_byte = new unsigned char[500000];
  nu.forbidden_zero_bit = 0;
  LoadY4MHeader();
  nu.nal_ref_idc = 1; nu.nal_unit_type = NAL_UNIT_TYPE_SPS;
  RBSP_encode(nu); writeNAL(nu);
  nu.nal_ref_idc = 1; nu.nal_unit_type = NAL_UNIT_TYPE_PPS;
  RBSP_encode(nu); writeNAL(nu);
  nu.nal_ref_idc = 1;
  while (ReadFromY4M() != -1) { frameCount++; if ((int)frameCount == startFrame) break; }
  printf("Frame #%lu\n", frameCount);
  writeToYUV();
  nu.nal_unit_type = selectNALUnitType();
  RBSP_encode(nu);
  writeNAL(nu);
  while ((int)frameCount != endFrame) {
    if (ReadFromY4M() == -1) break;
    frameCount++;
    currFrameCount++;
    printf("Frame #%lu\n", frameCount);
    writeToYUV();
    nu.nal_unit_type = selectNALUnitType();
    RBSP_encode(nu);
    writeNAL(nu);
  }
  CloseCL();
  CloseNAL();
  fclose(stream); fclose(yuvinput); fclose(yuvoutput);
  return 0;
}
